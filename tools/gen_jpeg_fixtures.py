#!/usr/bin/env python3
"""Generate the committed JPEG fixture set for q315 (segment-walk ingest).

Handcrafted segment-level JPEGs (SOI, APP0/APP1, DQT, SOF0/SOF2, DHT,
DRI, SOS + entropy bytes, EOI) — no imaging library, fully deterministic
bytes, so the fixtures and their manifest are stable across
regenerations. Entropy data is synthetic but SPEC-VALID at the segment
layer: every 0xFF in the entropy stream is stuffed as FF 00, restart
markers are emitted only under a DRI. The manifest records the
GENERATION parameters (dimensions, component count, per-kind table
counts and CRC32s over the exact table payload bytes, scan statistics) —
ground truth by construction, which is what makes it a legitimate oracle
for the jpeg_info expression: the decoder is checked against what the
files were BUILT with, never against its own output.

Discipline (the gen_pdf_fixtures.py pattern): an INDEPENDENT `walk()`
segment parser below re-reads every emitted good file and asserts it
reproduces the builder's declared manifest row, so the builder, this
parser and the Scala decoder must all agree three ways.

Planted corruptions (not in the manifest — the decoder must void
exactly these three and nothing else):
  corrupt_trunc.jpg  — img_base cut mid-scan (EOF before EOI)
  corrupt_marker.jpg — img_base's SOS marker byte flipped to reserved 0x7A
  corrupt_trail.jpg  — img_base + 3 trailing bytes after EOI
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "jpeg")


def seg(marker, payload=b""):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def app0_jfif():
    return seg(0xE0, b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00")


def tiff_ifd(byte_order, orientation, make, width, height):
    """A real TIFF IFD0 for the APP1 payload: ImageWidth (LONG),
    ImageLength (LONG), Make (ASCII — stored at an offset when > 4
    bytes, exercising the indirection), Orientation (SHORT — value
    left-justified in the 4-byte field). Entries tag-sorted, next-IFD
    offset 0. Works for both II and MM."""
    e = "<" if byte_order == b"II" else ">"
    make_b = make.encode() + b"\x00"
    n = 4
    header = byte_order + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    val_area_off = 8 + 2 + n * 12 + 4
    entries = b""
    entries += struct.pack(e + "HHI", 0x0100, 4, 1) + struct.pack(e + "I", width)
    entries += struct.pack(e + "HHI", 0x0101, 4, 1) + struct.pack(e + "I", height)
    if len(make_b) <= 4:
        entries += struct.pack(e + "HHI", 0x010F, 2, len(make_b)) + make_b.ljust(4, b"\x00")
        val_area = b""
    else:
        entries += struct.pack(e + "HHI", 0x010F, 2, len(make_b)) \
            + struct.pack(e + "I", val_area_off)
        val_area = make_b
    entries += struct.pack(e + "HHI", 0x0112, 3, 1) \
        + struct.pack(e + "H", orientation) + b"\x00\x00"
    ifd = struct.pack(e + "H", n) + entries + struct.pack(e + "I", 0)
    return b"Exif\x00\x00" + header + ifd + val_area


def app1_exif(byte_order=b"II", orientation=6, make="graftcam longname",
              width=640, height=480):
    return seg(0xE1, tiff_ifd(byte_order, orientation, make, width, height))


def dqt(tables):
    """tables: list of (pq, tq, seed) -> one DQT segment; returns (bytes, payload)."""
    payload = b""
    for pq, tq, seed in tables:
        entry = bytes([(pq << 4) | tq])
        n = 64 * (pq + 1)
        entry += bytes([(seed * 7 + k * 13) % 255 + 1 for k in range(n)])
        payload += entry
    return seg(0xDB, payload), payload


def dht(tables):
    """tables: list of (tc, th, nsyms) -> one DHT segment (counts put all
    symbols at length 8 for simplicity — counts must sum to len(symbols))."""
    payload = b""
    for tc, th, nsyms in tables:
        counts = [0] * 16
        counts[7] = nsyms
        payload += bytes([(tc << 4) | th]) + bytes(counts) \
            + bytes([(th * 11 + k * 3) % 251 for k in range(nsyms)])
    return seg(0xC4, payload), payload


def sof(marker, precision, height, width, ncomp):
    p = bytes([precision]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for c in range(ncomp):
        p += bytes([c + 1, 0x11, c % 2])  # id, 1x1 sampling, quant ref
    return seg(marker, p)


def sos_header(ncomp):
    p = bytes([ncomp])
    for c in range(ncomp):
        p += bytes([c + 1, 0x00])
    p += bytes([0, 63, 0])
    return seg(0xDA, p)


def entropy(n, seed, rst_every=0):
    """n pseudo-bytes with FF stuffing; RST markers every rst_every data
    bytes (only valid under a DRI). Returns (bytes, scan_bytes, n_rst) —
    scan_bytes counts EVERYTHING between SOS header and the next real
    marker (stuffing and RSTs included), matching the decoder."""
    out = bytearray()
    nrst = 0
    rst_ix = 0
    emitted = 0
    for k in range(n):
        v = (seed * 31 + k * 17) % 256
        if v == 0xFF:
            out += b"\xFF\x00"
        else:
            out.append(v)
        emitted += 1
        if rst_every and emitted % rst_every == 0 and k < n - 1:
            out += bytes([0xFF, 0xD0 + (rst_ix % 8)])
            rst_ix += 1
            nrst += 1
    return bytes(out), len(out), nrst


def crc(b):
    return zlib.crc32(b) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# independent re-validating parser (keep in sync with JpegFunctions.scala)
# ---------------------------------------------------------------------------
def walk(b):
    """Returns the manifest dict or None for malformed bytes."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    n = len(b)
    i = 2
    r = dict(n_segments=1, n_dqt=0, n_dht=0, n_scans=0, scan_bytes=0,
             n_rst=0, width=-1, height=-1, precision=-1, n_components=-1,
             progressive=False, jfif=False, exif=False)
    dqt_b = b""
    dht_b = b""
    sof_seen = False
    eoi = False
    try:
        while not eoi:
            if b[i] != 0xFF:
                return None
            while b[i] == 0xFF:
                i += 1
            m = b[i]
            i += 1
            if m == 0xD9:
                r["n_segments"] += 1
                eoi = True
                continue
            if m == 0xD8 or m <= 0x01 or (0xD0 <= m <= 0xD7) or m <= 0xBF:
                return None
            ln = struct.unpack(">H", b[i:i + 2])[0]
            if ln < 2 or i + ln > n:
                return None
            p, plen = i + 2, ln - 2
            pay = b[p:p + plen]
            if m in (0xC0, 0xC2):
                if sof_seen or plen < 6:
                    return None
                sof_seen = True
                r["progressive"] = m == 0xC2
                r["precision"] = pay[0]
                r["height"], r["width"] = struct.unpack(">HH", pay[1:5])
                r["n_components"] = pay[5]
                if not (1 <= r["n_components"] <= 4) or r["width"] < 1 \
                        or r["height"] < 1 or plen != 6 + 3 * r["n_components"]:
                    return None
                for c in range(r["n_components"]):
                    if pay[6 + 3 * c + 2] > 3:
                        return None
            elif m == 0xC4:
                off = 0
                while off < plen:
                    tcth = pay[off]
                    if (tcth >> 4) > 1 or (tcth & 0x0F) > 3 or off + 17 > plen:
                        return None
                    s = sum(pay[off + 1:off + 17])
                    if off + 17 + s > plen:
                        return None
                    r["n_dht"] += 1
                    off += 17 + s
                if off != plen:
                    return None
                dht_b += pay
            elif m == 0xDB:
                off = 0
                while off < plen:
                    pqtq = pay[off]
                    if (pqtq >> 4) > 1 or (pqtq & 0x0F) > 3:
                        return None
                    sz = 1 + 64 * ((pqtq >> 4) + 1)
                    if off + sz > plen:
                        return None
                    r["n_dqt"] += 1
                    off += sz
                if off != plen:
                    return None
                dqt_b += pay
            elif m == 0xDD:
                if plen != 2:
                    return None
            elif m == 0xDA:
                if not sof_seen or plen < 1:
                    return None
                ns = pay[0]
                if not (1 <= ns <= 4) or plen != 1 + 2 * ns + 3:
                    return None
                r["n_scans"] += 1
                j = i + ln
                while True:
                    if j >= n:
                        return None
                    if b[j] != 0xFF:
                        r["scan_bytes"] += 1
                        j += 1
                    else:
                        if j + 1 >= n:
                            return None
                        nx = b[j + 1]
                        if nx == 0x00:
                            r["scan_bytes"] += 2
                            j += 2
                        elif 0xD0 <= nx <= 0xD7:
                            r["n_rst"] += 1
                            r["scan_bytes"] += 2
                            j += 2
                        elif nx == 0xFF:
                            r["scan_bytes"] += 1
                            j += 1
                        else:
                            break
                i = j - ln
            elif 0xE0 <= m <= 0xEF:
                if m == 0xE0 and pay[:5] == b"JFIF\x00":
                    r["jfif"] = True
                if m == 0xE1 and pay[:6] == b"Exif\x00\x00":
                    r["exif"] = True
            elif m == 0xFE:
                pass
            else:
                return None
            r["n_segments"] += 1
            i += ln
        if i != n or not sof_seen or r["n_scans"] < 1:
            return None
    except IndexError:
        return None
    r["dqt_crc32"] = crc(dqt_b)
    r["dht_crc32"] = crc(dht_b)
    return r


def main():
    os.makedirs(OUT, exist_ok=True)
    files = {}

    # img_base: the canonical baseline JFIF file — APP0, one DQT (2 8-bit
    # tables in ONE segment: internal tiling), SOF0 3-comp, two DHT
    # segments, single scan.
    d1, _ = dqt([(0, 0, 3), (0, 1, 5)])
    h1, _ = dht([(0, 0, 12), (1, 0, 20)])
    h2, _ = dht([(0, 1, 9), (1, 1, 17)])
    e1, _, _ = entropy(400, seed=7)
    files["img_base.jpg"] = (b"\xFF\xD8" + app0_jfif() + d1
                             + sof(0xC0, 8, 37, 53, 3) + h1 + h2
                             + sos_header(3) + e1 + b"\xFF\xD9")

    # img_exif: grayscale with a FULL little-endian EXIF IFD (Make at an
    # offset — the indirection path), DRI + restart markers in the scan.
    d2, _ = dqt([(0, 0, 11)])
    h3, _ = dht([(0, 0, 8), (1, 0, 11)])
    e2, _, _ = entropy(300, seed=13, rst_every=64)
    files["img_exif.jpg"] = (b"\xFF\xD8"
                             + app1_exif(b"II", 6, "graftcam longname", 640, 480)
                             + d2 + sof(0xC0, 8, 480, 640, 1) + h3
                             + seg(0xDD, struct.pack(">H", 64))
                             + sos_header(1) + e2 + b"\xFF\xD9")

    # img_exif_mm: the BIG-ENDIAN byte-order leg (MM), short inline Make,
    # orientation 3 — every multi-byte IFD field swaps.
    d2b, _ = dqt([(0, 1, 23)])
    h3b, _ = dht([(0, 0, 5), (1, 0, 9)])
    e2b, _, _ = entropy(150, seed=47)
    files["img_exif_mm.jpg"] = (b"\xFF\xD8"
                                + app1_exif(b"MM", 3, "gfx", 320, 200)
                                + d2b + sof(0xC0, 8, 200, 320, 1) + h3b
                                + sos_header(1) + e2b + b"\xFF\xD9")

    # img_prog: SOF2 progressive, TWO scans with a DHT between them (the
    # multi-scan walk), plus a COM segment.
    d3, _ = dqt([(0, 0, 2), (0, 1, 4), (0, 2, 6)])
    h4, _ = dht([(0, 0, 10)])
    h5, _ = dht([(1, 0, 14)])
    e3, _, _ = entropy(250, seed=21)
    e4, _, _ = entropy(180, seed=29)
    files["img_prog.jpg"] = (b"\xFF\xD8" + app0_jfif()
                             + seg(0xFE, b"graft progressive fixture") + d3
                             + sof(0xC2, 8, 101, 67, 3) + h4
                             + sos_header(3) + e3 + h5
                             + sos_header(3) + e4 + b"\xFF\xD9")

    # img_16q: a 16-bit quant table (Pq=1, 129-byte entry) + 4 components.
    d4, _ = dqt([(1, 0, 9)])
    d5, _ = dqt([(0, 1, 15), (0, 2, 17), (0, 3, 19)])
    h6, _ = dht([(0, 0, 6), (1, 0, 7), (0, 1, 5), (1, 1, 4)])
    e5, _, _ = entropy(220, seed=41)
    files["img_16q.jpg"] = (b"\xFF\xD8" + d4 + d5
                            + sof(0xC0, 8, 7, 1024, 4) + h6
                            + sos_header(4) + e5 + b"\xFF\xD9")

    # img_tiny: minimal 1x1 grayscale.
    d6, _ = dqt([(0, 0, 1)])
    h7, _ = dht([(0, 0, 2), (1, 0, 2)])
    e6, _, _ = entropy(6, seed=3)
    files["img_tiny.jpg"] = (b"\xFF\xD8" + app0_jfif() + d6
                             + sof(0xC0, 8, 1, 1, 1) + h7
                             + sos_header(1) + e6 + b"\xFF\xD9")

    rows = []
    for name in sorted(files):
        data = files[name]
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        m = walk(data)
        assert m is not None, f"{name}: generator emitted malformed bytes"
        rows.append((name, m, len(data)))

    # builder intent vs independent parser: the manifest rows come from
    # walk(), so pin walk() against what the sof()/dqt()/dht() calls
    # above were TOLD to build (dimensions, table counts, scan counts)
    by = {name: m for name, m, _ in rows}
    assert (by["img_base.jpg"]["width"], by["img_base.jpg"]["height"],
            by["img_base.jpg"]["n_components"]) == (53, 37, 3)
    assert (by["img_base.jpg"]["n_dqt"], by["img_base.jpg"]["n_dht"]) == (2, 4)
    assert (by["img_exif.jpg"]["width"], by["img_exif.jpg"]["exif"],
            by["img_exif.jpg"]["n_rst"]) == (640, True, 4)
    assert (by["img_prog.jpg"]["progressive"],
            by["img_prog.jpg"]["n_scans"]) == (True, 2)
    assert (by["img_16q.jpg"]["n_dqt"],
            by["img_16q.jpg"]["n_components"]) == (4, 4)
    assert (by["img_tiny.jpg"]["width"], by["img_tiny.jpg"]["height"]) == (1, 1)

    base = files["img_base.jpg"]
    # planted corruption trio — each must decode to null, nothing else may
    trunc = base[:len(base) - 60]
    sos_at = base.index(b"\xFF\xDA")
    flip = base[:sos_at + 1] + b"\x7A" + base[sos_at + 2:]
    trail = base + b"\x00\x01\x02"
    for bad_name, bad in (("corrupt_trunc.jpg", trunc),
                          ("corrupt_marker.jpg", flip),
                          ("corrupt_trail.jpg", trail)):
        assert walk(bad) is None, f"{bad_name}: expected malformed"
        with open(os.path.join(OUT, bad_name), "wb") as f:
            f.write(bad)

    cols = ["width", "height", "precision", "n_components", "progressive",
            "n_segments", "n_dqt", "dqt_crc32", "n_dht", "dht_crc32",
            "jfif", "exif", "n_scans", "scan_bytes", "n_rst"]
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name," + ",".join(cols) + ",n_bytes\n")
        for name, m, nb in rows:
            vals = [str(m[c]).lower() if isinstance(m[c], bool) else str(m[c])
                    for c in cols]
            f.write(f"{name}," + ",".join(vals) + f",{nb}\n")

    # EXIF manifest: BUILDER INTENT — the exact parameters the IFDs above
    # were constructed with (q319's oracle; the Scala decoder recovers
    # them independently from the bytes)
    with open(os.path.join(OUT, "manifest_exif.csv"), "w") as f:
        f.write("name,byte_order,n_entries,orientation,width_tag,height_tag,make\n")
        f.write("img_exif.jpg,II,4,6,640,480,graftcam longname\n")
        f.write("img_exif_mm.jpg,MM,4,3,320,200,gfx\n")
    print(f"wrote {len(rows)} good + 3 corrupt fixtures to {OUT}")


if __name__ == "__main__":
    main()
