#!/usr/bin/env python3
"""Generate the committed JPEG DECODE fixture set for q316 (full baseline
entropy decode -> dequant -> IDCT, grayscale non-subsampled).

Files are REAL baseline JPEGs at the bitstream level: canonical Huffman
tables (carried in DHT — the decoder builds codes from the file, nothing
hardcoded), Annex-F DC difference/AC run-length coding with byte
stuffing, optional restart markers, zigzag coefficient order, zigzag-
ordered DQT. Coefficients are chosen DIRECTLY by deterministic formula
(an encoder's DCT stage is irrelevant to decoding — what matters is
that the bitstream is spec-valid and the expected pixels are known), so
the expected pixel surface is computed by the SAME fixed-point integer
IDCT the Scala decoder runs:

    pix(y, x) = clamp(128 + ((sum_{a,b} K[y][a]*K[x][b]*M[a][b]
                              + (1 << 21)) >> 22), 0, 255)

with K the 8x8 integer cosine matrix below (round(1024*c(u)*cos((2x+1)
u*pi/16)), c(0)=1/sqrt(2)) embedded AS THE SAME LITERALS in
JpegFunctions.scala — integer-only arithmetic end to end, so the two
implementations cannot drift by a ULP (the q246 shared-constant
discipline applied to a whole transform).

Independent validation (the gen_pdf_fixtures.py discipline): a
standalone Huffman re-decoder below re-reads every emitted bitstream and
asserts the coefficient round-trip before the manifest is written.

Planted corruption (not in the manifest): corrupt_acrun.jpg carries a
hand-built bitstream whose AC run overruns index 63 — the decoder must
void exactly that file.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "jpeg_decode")

# shared integer IDCT matrix — keep byte-identical with JpegFunctions.scala
K = [
    [724, 1004, 946, 851, 724, 569, 392, 200],
    [724, 851, 392, -200, -724, -1004, -946, -569],
    [724, 569, -392, -1004, -724, 200, 946, 851],
    [724, 200, -946, -569, 724, 851, -392, -1004],
    [724, -200, -946, 569, 724, -851, -392, 1004],
    [724, -569, -392, 1004, -724, -200, 946, -851],
    [724, -851, 392, 200, -724, 1004, -946, 569],
    [724, -1004, 946, -851, 724, -569, 392, -200],
]
ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26,
      33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56,
      57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52, 45, 38,
      31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# custom canonical Huffman tables (carried in DHT): DC categories 0..11
# all at length 4; AC (run,size) for run 0..15 x size 1..10 plus EOB and
# ZRL, all at length 8 — fixed-length canonical codes, < 255 symbols so
# the all-ones code stays unassigned.
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
DC_BITS = [0, 0, 0, 12] + [0] * 12   # counts per length 1..16
AC_BITS = [0] * 7 + [len(AC_SYMS)] + [0] * 8


def canonical(bits, syms):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = canonical(DC_BITS, DC_SYMS)
AC_CODES = canonical(AC_BITS, AC_SYMS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nb = 0

    def align(self):
        while self.nb != 0:
            self.put(1, 1)


def category(v):
    return abs(v).bit_length()


def put_coef(bw, codes, sym_high, v):
    s = category(v)
    ln, code = codes[(sym_high << 4) | s] if codes is AC_CODES else codes[s]
    bw.put(code, ln)
    if s > 0:
        bw.put(v if v > 0 else v + (1 << s) - 1, s)


def encode_block(bw, coefs_zz, pred):
    """coefs_zz: 64 quantized coefficients in zigzag order."""
    diff = coefs_zz[0] - pred
    s = category(diff)
    ln, code = DC_CODES[s]
    bw.put(code, ln)
    if s > 0:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and coefs_zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            ln, code = AC_CODES[0x00]  # EOB
            bw.put(code, ln)
            break
        while run >= 16:
            ln, code = AC_CODES[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        v = coefs_zz[k]
        s = category(v)
        assert 1 <= s <= 10, f"AC category {s} out of table"
        ln, code = AC_CODES[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        k += 1
    return coefs_zz[0]


def seg(marker, payload=b""):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def dht_payload():
    p = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_SYMS)
    p += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_SYMS)
    return p


def idct_block(coefs_zz, q_zz):
    m = [[0] * 8 for _ in range(8)]
    for k in range(64):
        m[ZZ[k] // 8][ZZ[k] % 8] = coefs_zz[k] * q_zz[k]
    px = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0
            for a in range(8):
                if K[y][a] == 0:
                    continue
                inner = 0
                for b in range(8):
                    inner += K[x][b] * m[a][b]
                acc += K[y][a] * inner
            v = 128 + ((acc + (1 << 21)) >> 22)
            px[y][x] = 0 if v < 0 else (255 if v > 255 else v)
    return px


def coef_formula(bi, kind):
    """Deterministic sparse zigzag coefficients for block index bi."""
    c = [0] * 64
    # DC in [-40, 40]: pixel shift ≈ dc·q/8, so quant ≤ 24 keeps most
    # blocks unsaturated (gray_multi's dense blocks still clip at 0/255 —
    # the clamp path stays exercised there)
    c[0] = ((bi * 37) % 81) - 40
    if kind == "dc_only":
        return c
    c[1] = ((bi * 11) % 21) - 10
    c[5] = ((bi * 7) % 15) - 7
    c[17] = ((bi * 13) % 9) - 4
    if kind == "dense" and bi % 3 == 0:
        c[30] = ((bi * 5) % 7) - 3
        c[63] = 1 if bi % 2 == 0 else -1    # forces a full 63-coef walk
    if kind == "zrl" and bi % 2 == 1:
        c[1] = 0
        c[5] = 0
        c[17] = 0
        c[40] = 3                            # 39 zeros -> 2x ZRL + run 7
    return c


def build_file(width, height, kind, q_seed, rst_interval=0, jfif=True):
    assert width % 8 == 0 and height % 8 == 0
    bw_blocks = width // 8
    bh_blocks = height // 8
    n_blocks = bw_blocks * bh_blocks
    q_zz = [1 + ((q_seed * 7 + k * 5) % 24) for k in range(64)]

    head = b"\xFF\xD8"
    if jfif:
        head += seg(0xE0, b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00")
    head += seg(0xDB, bytes([0x00]) + bytes(q_zz))
    sofp = bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0])
    head += seg(0xC0, sofp)
    head += seg(0xC4, dht_payload())
    if rst_interval:
        head += seg(0xDD, struct.pack(">H", rst_interval))
    head += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = BitWriter()
    pred = 0
    blocks = []
    n_rst = 0
    body = bytearray()
    for bi in range(n_blocks):
        if rst_interval and bi > 0 and bi % rst_interval == 0:
            bw.align()
            body += bw.out
            bw = BitWriter()
            body += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = 0
        c = coef_formula(bi, kind)
        pred = encode_block(bw, c, pred)
        blocks.append(c)
    bw.align()
    body += bw.out
    data = head + bytes(body) + b"\xFF\xD9"

    # expected pixel surface via the shared integer IDCT
    px = [[0] * width for _ in range(height)]
    for bi, c in enumerate(blocks):
        by, bx = divmod(bi, bw_blocks)
        blk = idct_block(c, q_zz)
        for y in range(8):
            for x in range(8):
                px[by * 8 + y][bx * 8 + x] = blk[y][x]
    flat = bytes(v for row in px for v in row)
    stats = dict(width=width, height=height, n_blocks=n_blocks, n_rst=n_rst,
                 px_min=min(flat), px_max=max(flat),
                 px_sum=sum(flat), px_sqsum=sum(v * v for v in flat),
                 px_crc32=zlib.crc32(flat) & 0xFFFFFFFF)
    return data, blocks, q_zz, stats, rst_interval


# ---------------------------------------------------------------------------
# independent bitstream re-decoder (coefficient round-trip gate)
# ---------------------------------------------------------------------------
class BitReader:
    def __init__(self, b, i):
        self.b = b
        self.i = i
        self.acc = 0
        self.nb = 0

    def align_marker(self):
        self.acc = 0
        self.nb = 0

    def bit(self):
        if self.nb == 0:
            v = self.b[self.i]
            self.i += 1
            if v == 0xFF:
                assert self.b[self.i] == 0x00, "unexpected marker in scan"
                self.i += 1
            self.acc = v
            self.nb = 8
        self.nb -= 1
        return (self.acc >> self.nb) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def decode_stream(data, n_blocks, rst_interval):
    dec_dc = {v: k for k, v in DC_CODES.items()}
    dec_ac = {v: k for k, v in AC_CODES.items()}

    def read_code(table, br):
        ln = 0
        code = 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise AssertionError("bad code")

    def extend(r, s):
        return r if r >= (1 << (s - 1)) else r - (1 << s) + 1

    sos = data.index(b"\xFF\xDA")
    ln = struct.unpack(">H", data[sos + 2:sos + 4])[0]
    br = BitReader(data, sos + 2 + ln)
    pred = 0
    out = []
    nrst = 0
    for bi in range(n_blocks):
        if rst_interval and bi > 0 and bi % rst_interval == 0:
            i = br.i
            assert data[i] == 0xFF and data[i + 1] == 0xD0 + (nrst % 8)
            br = BitReader(data, i + 2)
            nrst += 1
            pred = 0
        c = [0] * 64
        s = read_code(dec_dc, br)
        diff = extend(br.bits(s), s) if s else 0
        pred += diff
        c[0] = pred
        k = 1
        while k < 64:
            sym = read_code(dec_ac, br)
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            k += sym >> 4
            s = sym & 0x0F
            assert k < 64
            c[k] = extend(br.bits(s), s)
            k += 1
        out.append(c)
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    specs = [
        ("gray_multi.jpg", 48, 32, "dense", 3, 0, True),
        ("gray_small.jpg", 16, 16, "plain", 9, 0, True),
        ("gray_dconly.jpg", 24, 8, "dc_only", 5, 0, True),
        ("gray_rst.jpg", 32, 16, "plain", 7, 2, True),
        ("gray_zrl.jpg", 16, 24, "zrl", 11, 0, True),
        # q324 planted EXACT PIXEL DUPLICATES: identical coefficients and
        # quant (same kind/dims/seed) so the decoded surfaces — and their
        # CRCs — are equal, but DIFFERENT bytes (one drops the JFIF APP0):
        # metadata-level dedup (md5 of the file) would miss them
        ("gray_dup_a.jpg", 16, 16, "plain", 13, 0, True),
        ("gray_dup_b.jpg", 16, 16, "plain", 13, 0, False),
    ]
    rows = []
    for name, w, h, kind, qs, rst, jfif in specs:
        data, blocks, q_zz, stats, rsti = build_file(w, h, kind, qs, rst, jfif)
        redec = decode_stream(data, stats["n_blocks"], rsti)
        assert redec == blocks, f"{name}: coefficient round-trip failed"
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, stats, len(data)))

    # corrupt: AC run walks past index 63 (4x ZRL + a (run=3,size=1) coef
    # from k=1 -> 1+64+3 > 63) — hand-built bitstream, must decode null
    q_zz = [1 + (k % 24) for k in range(64)]
    head = b"\xFF\xD8"
    head += seg(0xDB, bytes([0x00]) + bytes(q_zz))
    head += seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    head += seg(0xC4, dht_payload())
    head += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = BitWriter()
    ln, code = DC_CODES[0]
    bw.put(code, ln)  # DC diff 0
    for _ in range(4):
        ln, code = AC_CODES[0xF0]
        bw.put(code, ln)
    ln, code = AC_CODES[(3 << 4) | 1]
    bw.put(code, ln)
    bw.put(1, 1)
    bw.align()
    bad = head + bytes(bw.out) + b"\xFF\xD9"
    with open(os.path.join(OUT, "corrupt_acrun.jpg"), "wb") as f:
        f.write(bad)

    cols = ["width", "height", "n_blocks", "n_rst", "px_min", "px_max",
            "px_sum", "px_sqsum", "px_crc32"]
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name," + ",".join(cols) + ",n_bytes\n")
        for name, st, nb in rows:
            f.write(f"{name}," + ",".join(str(st[c]) for c in cols) + f",{nb}\n")
    print(f"wrote {len(rows)} good + 1 corrupt decode fixtures to {OUT}")


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# q325: color 4:2:0 fixtures (fixtures/jpeg_color) — JFIF YCbCr->RGB in
# 2^16 fixed point; keep the four constants byte-identical with
# JpegFunctions.scala JpegRgb
# ---------------------------------------------------------------------------
COLOR_OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "jpeg_color")
CR_R, CB_G, CR_G, CB_B = 91881, 22554, 46802, 116130


def color_coefs(mi, t, kind):
    """Zigzag coefficients for MCU mi, block slot t (0-3 = Y 2x2 raster,
    4 = Cb, 5 = Cr)."""
    c = [0] * 64
    bi = mi * 6 + t
    if t < 4:
        c[0] = ((bi * 29) % 81) - 40
        c[1] = ((bi * 7) % 17) - 8
        c[5] = ((bi * 11) % 13) - 6
    else:
        # chroma: gentle DC + one AC so hue varies without saturating
        c[0] = ((bi * 13) % 41) - 20
        c[2] = ((bi * 5) % 9) - 4
    if kind == "dense" and t == 0 and mi % 2 == 0:
        c[63] = 1
    return c


def build_color_file(width, height, kind, q_seed, rst_interval=0):
    assert width % 16 == 0 and height % 16 == 0
    mcu_w, mcu_h = width // 16, height // 16
    n_mcus = mcu_w * mcu_h
    q0 = [1 + ((q_seed * 7 + k * 5) % 20) for k in range(64)]
    q1 = [1 + ((q_seed * 11 + k * 3) % 16) for k in range(64)]

    head = b"\xFF\xD8"
    head += seg(0xE0, b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00")
    head += seg(0xDB, bytes([0x00]) + bytes(q0) + bytes([0x01]) + bytes(q1))
    sofp = bytes([8]) + struct.pack(">HH", height, width) + bytes([3]) \
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    head += seg(0xC0, sofp)
    head += seg(0xC4, dht_payload())
    if rst_interval:
        head += seg(0xDD, struct.pack(">H", rst_interval))
    head += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bw = BitWriter()
    preds = [0, 0, 0]
    body = bytearray()
    n_rst = 0
    mcu_blocks = []
    for mi in range(n_mcus):
        if rst_interval and mi > 0 and mi % rst_interval == 0:
            bw.align()
            body += bw.out
            bw = BitWriter()
            body += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            preds = [0, 0, 0]
        blocks = []
        for t in range(6):
            comp = 0 if t < 4 else (1 if t == 4 else 2)
            c = color_coefs(mi, t, kind)
            # re-spell encode_block with per-component predictors
            diff = c[0] - preds[comp]
            scat = category(diff)
            ln, code = DC_CODES[scat]
            bw.put(code, ln)
            if scat > 0:
                bw.put(diff if diff > 0 else diff + (1 << scat) - 1, scat)
            preds[comp] = c[0]
            k = 1
            while k < 64:
                run = 0
                while k < 64 and c[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    ln, code = AC_CODES[0x00]
                    bw.put(code, ln)
                    break
                while run >= 16:
                    ln, code = AC_CODES[0xF0]
                    bw.put(code, ln)
                    run -= 16
                v = c[k]
                sz = category(v)
                ln, code = AC_CODES[(run << 4) | sz]
                bw.put(code, ln)
                bw.put(v if v > 0 else v + (1 << sz) - 1, sz)
                k += 1
            blocks.append(c)
        mcu_blocks.append(blocks)
    bw.align()
    body += bw.out
    data = head + bytes(body) + b"\xFF\xD9"

    # expected RGB surface: per-MCU IDCT, NN chroma upsample, fixed-point
    # JFIF conversion — the SAME integer ops as JpegRgb.decode
    rgb = bytearray(width * height * 3)
    pmin, pmax, psum, psq = 255, 0, 0, 0
    for mi, blocks in enumerate(mcu_blocks):
        ytile = [[0] * 16 for _ in range(16)]
        for t in range(4):
            px8 = idct_block(blocks[t], q0)
            oy, ox = (t // 2) * 8, (t % 2) * 8
            for y in range(8):
                for x in range(8):
                    ytile[oy + y][ox + x] = px8[y][x]
        cb8 = idct_block(blocks[4], q1)
        cr8 = idct_block(blocks[5], q1)
        my, mx = divmod(mi, mcu_w)
        for py in range(16):
            for px in range(16):
                yv = ytile[py][px]
                cb = cb8[py // 2][px // 2] - 128
                cr = cr8[py // 2][px // 2] - 128
                r = yv + ((CR_R * cr + 32768) >> 16)
                g = yv - ((CB_G * cb + CR_G * cr + 32768) >> 16)
                bl = yv + ((CB_B * cb + 32768) >> 16)
                r = 0 if r < 0 else (255 if r > 255 else r)
                g = 0 if g < 0 else (255 if g > 255 else g)
                bl = 0 if bl < 0 else (255 if bl > 255 else bl)
                base = ((my * 16 + py) * width + mx * 16 + px) * 3
                rgb[base], rgb[base + 1], rgb[base + 2] = r, g, bl
                for v in (r, g, bl):
                    pmin = min(pmin, v)
                    pmax = max(pmax, v)
                    psum += v
                    psq += v * v
    stats = dict(width=width, height=height, n_mcus=n_mcus, n_rst=n_rst,
                 px_min=pmin, px_max=pmax, px_sum=psum, px_sqsum=psq,
                 px_crc32=zlib.crc32(bytes(rgb)) & 0xFFFFFFFF)
    return data, stats


def gen_color():
    os.makedirs(COLOR_OUT, exist_ok=True)
    specs = [
        ("color_multi.jpg", 64, 48, "dense", 5, 0),
        ("color_small.jpg", 16, 16, "plain", 9, 0),
        ("color_rst.jpg", 48, 16, "plain", 7, 2),
        ("color_tall.jpg", 32, 64, "plain", 3, 0),
    ]
    rows = []
    for name, w, h, kind, qs, rst in specs:
        data, stats = build_color_file(w, h, kind, qs, rst)
        with open(os.path.join(COLOR_OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, stats, len(data)))
    cols = ["width", "height", "n_mcus", "n_rst", "px_min", "px_max",
            "px_sum", "px_sqsum", "px_crc32"]
    with open(os.path.join(COLOR_OUT, "manifest.csv"), "w") as f:
        f.write("name," + ",".join(cols) + ",n_bytes\n")
        for name, st, nb in rows:
            f.write(f"{name}," + ",".join(str(st[c]) for c in cols) + f",{nb}\n")
    print(f"wrote {len(rows)} color fixtures to {COLOR_OUT}")



if __name__ == "__main__":
    gen_color()
