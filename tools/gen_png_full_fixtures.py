#!/usr/bin/env python3
"""Generate the committed FULL-PROFILE PNG fixture set for q333: the
rungs q167's truecolor decoder left out — grayscale (type 0), PALETTE
(type 3, PLTE-mapped), RGBA, and ADAM7 INTERLACE for each — plus odd
dimensions so partial interlace passes are exercised.

Every file's sample surface is a planted formula; the manifest stats
are computed from the FORMULA (palette expanded through the same PLTE
the file carries), never from a decoder. Filters cycle through all five
types row by row (within each interlace pass independently — the pass
neighborhood rule is exactly what Adam7 implementations get wrong).

Planted corruption (not in the manifest): corrupt_palidx.png carries a
palette index past the PLTE (must void), corrupt_trunc.png is cut
mid-IDAT, corrupt_extra.png inflates to MORE scanlines than the
geometry demands.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png_full")

ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def sample(x, y, c, color_type, seed, npal):
    if color_type == 0:
        return (x * 7 + y * 13 + seed) % 256
    if color_type == 3:
        return (x + y + seed) % npal
    return (x * (3 + c) + y * (5 + 2 * c) + seed) % 256


def palette(npal, seed):
    return bytes(v for i in range(npal)
                 for v in ((i * 11 + seed) % 256, (i * 17 + 2 * seed) % 256,
                           (i * 23 + 3 * seed) % 256))


def filt(row, prior, nchan, ftype):
    out = bytearray([ftype])
    for i, v in enumerate(row):
        left = row[i - nchan] if i >= nchan else 0
        up = prior[i] if prior else 0
        ul = prior[i - nchan] if (prior and i >= nchan) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def build_png(w, h, color_type, seed, interlace, npal=16):
    nchan = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    surf = [[sample(x, y, c, color_type, seed, npal)
             for x in range(w) for c in range(nchan)] for y in range(h)]
    # scanline stream: single pass, or Adam7 passes each independently
    stream = bytearray()
    n_passes = 1
    if interlace == 0:
        prior = None
        for y in range(h):
            stream += filt(surf[y], prior, nchan, y % 5)
            prior = surf[y]
    else:
        n_passes = 0
        for (x0, y0, dx, dy) in ADAM7:
            pw = max(0, (w - x0 + dx - 1) // dx)
            ph = max(0, (h - y0 + dy - 1) // dy)
            if pw == 0 or ph == 0:
                continue
            n_passes += 1
            prior = None
            for j in range(ph):
                row = []
                for i in range(pw):
                    sy, sx = y0 + j * dy, x0 + i * dx
                    row += surf[sy][sx * nchan:(sx + 1) * nchan]
                stream += filt(row, prior, nchan, (j + 1) % 5)
                prior = row
    data = b"\x89PNG\r\n\x1a\n"
    data += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                       0, 0, interlace))
    pal = palette(npal, seed) if color_type == 3 else None
    if pal:
        data += chunk(b"PLTE", pal)
    z = zlib.compress(bytes(stream), 6)
    # split across two IDATs to exercise concatenation
    mid = len(z) // 2
    data += chunk(b"IDAT", z[:mid]) + chunk(b"IDAT", z[mid:])
    data += chunk(b"IEND", b"")

    # manifest stats over the FINAL surface (palette expanded)
    pmin, pmax, psum, psq = 255, 0, 0, 0
    crc = 0
    if color_type == 3:
        rows = []
        for y in range(h):
            rb = bytearray()
            for x in range(w):
                idx = surf[y][x]
                for c in range(3):
                    v = pal[3 * idx + c]
                    pmin = min(pmin, v); pmax = max(pmax, v)
                    psum += v; psq += v * v
                    rb.append(v)
            rows.append(bytes(rb))
        crc = zlib.crc32(b"".join(rows)) & 0xFFFFFFFF
    else:
        flat = bytes(v for y in range(h) for v in surf[y])
        pmin, pmax = min(flat), max(flat)
        psum = sum(flat)
        psq = sum(v * v for v in flat)
        crc = zlib.crc32(flat) & 0xFFFFFFFF
    stats = dict(width=w, height=h, color_type=color_type,
                 palette_size=npal if color_type == 3 else 0,
                 interlaced=str(bool(interlace)).lower(),
                 n_passes=n_passes, px_min=pmin, px_max=pmax,
                 px_sum=psum, px_sqsum=psq, px_crc32=crc)
    return data, stats


def main():
    os.makedirs(OUT, exist_ok=True)
    specs = [
        ("full_gray.png", 40, 32, 0, 3, 0),
        ("full_rgb.png", 32, 24, 2, 7, 0),   # ALSO decodes under q167
        ("full_palette.png", 48, 24, 3, 5, 0),
        ("full_gray_i7.png", 40, 32, 0, 9, 1),
        ("full_rgb_i7.png", 32, 24, 2, 11, 1),
        ("full_palette_i7.png", 37, 23, 3, 13, 1),  # odd dims: partial passes
        ("full_rgba_i7.png", 24, 16, 6, 15, 1),
    ]
    rows = []
    for name, w, h, ct, seed, il in specs:
        data, stats = build_png(w, h, ct, seed, il)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, stats, len(data)))

    # corruptions (not in the manifest)
    good, _ = build_png(16, 16, 3, 5, 0, npal=8)
    with open(os.path.join(OUT, "corrupt_trunc.png"), "wb") as f:
        f.write(good[:len(good) - 20])
    # palette index out of range: rebuild with an index == npal planted
    bad_stream = bytearray()
    prior = None
    for y in range(8):
        row = [(x + y) % 8 for x in range(8)]
        if y == 3:
            row[4] = 8  # == npal -> out of range
        bad_stream += filt(row, prior, 1, y % 5)
        prior = row
    badz = zlib.compress(bytes(bad_stream), 6)
    bad = b"\x89PNG\r\n\x1a\n"
    bad += chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 3, 0, 0, 0))
    bad += chunk(b"PLTE", palette(8, 5))
    bad += chunk(b"IDAT", badz) + chunk(b"IEND", b"")
    with open(os.path.join(OUT, "corrupt_palidx.png"), "wb") as f:
        f.write(bad)
    # extra scanlines: valid geometry says 8 rows, stream carries 9
    xs = bytearray()
    prior = None
    for y in range(9):
        row = [(x * 3 + y) % 256 for x in range(8)]
        xs += filt(row, prior, 1, 0)
        prior = row
    xz = zlib.compress(bytes(xs), 6)
    xtra = b"\x89PNG\r\n\x1a\n"
    xtra += chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
    xtra += chunk(b"IDAT", xz) + chunk(b"IEND", b"")
    with open(os.path.join(OUT, "corrupt_extra.png"), "wb") as f:
        f.write(xtra)

    cols = ["width", "height", "color_type", "palette_size", "interlaced",
            "n_passes", "px_min", "px_max", "px_sum", "px_sqsum", "px_crc32"]
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name," + ",".join(cols) + ",n_bytes\n")
        for name, st, nb in sorted(rows):
            f.write(f"{name}," + ",".join(str(st[c]) for c in cols) + f",{nb}\n")
    print(f"wrote {len(rows)} good + 3 corrupt png_full fixtures to {OUT}")


if __name__ == "__main__":
    main()
