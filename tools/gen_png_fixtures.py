#!/usr/bin/env python3
"""Generate the committed PNG fixture set for q144 (binaryFile ingest)
and q167 (pixel-stream decode).

Handcrafted PNGs (signature + IHDR + IDAT(zlib) + IEND) — no imaging
library needed, fully deterministic bytes (zlib level 6, fixed pixel
formulas), so the fixtures and their manifest are stable across
regenerations. The manifest records the GENERATION parameters (name,
width, height, bit_depth, color_type) plus the written byte length —
ground truth by construction, which is what makes it a legitimate
oracle for the IHDR decode expression: the decoder is checked against
what the files were BUILT with, never against its own output.

q167 additions: two fixtures are written with NON-ZERO scanline filters
(Sub/Up/Average/Paeth — the full PNG filter set), so the pixel decoder's
unfilter paths are exercised, not just the trivial filter-0 passthrough;
and pixels.csv records per-file pixel statistics (count/min/max/sum/
sum-of-squares over every channel sample of the RAW pixel stream) —
the q167 oracle, computed from the same pixel formula the writer used.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png")

def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c

def raw_pixels(width, height, nchan):
    """The generation formula: per-scanline lists of channel bytes."""
    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            px = [(x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256,
                  (x + y * 11) % 256, (x * 17 + y) % 256][:nchan]
            row.extend(px)
        rows.append(row)
    return rows

def filter_row(ftype, row, prior, bpp):
    """Apply PNG filter `ftype` to raw scanline `row` (prior = previous
    raw scanline, zeros for the first)."""
    out = []
    for i, v in enumerate(row):
        left = row[i - bpp] if i >= bpp else 0
        up = prior[i]
        upleft = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out.append(v & 0xFF)
        elif ftype == 1:
            out.append((v - left) & 0xFF)
        elif ftype == 2:
            out.append((v - up) & 0xFF)
        elif ftype == 3:
            out.append((v - (left + up) // 2) & 0xFF)
        else:
            out.append((v - paeth(left, up, upleft)) & 0xFF)
    return out

def png(width, height, color_type, filter_of_y=lambda y: 0):
    nchan = {2: 3, 6: 4}[color_type]
    rows = raw_pixels(width, height, nchan)
    raw = b""
    prior = [0] * (width * nchan)
    for y, row in enumerate(rows):
        f = filter_of_y(y)
        raw += bytes([f]) + bytes(filter_row(f, row, prior, nchan))
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    samples = [v for row in rows for v in row]
    stats = (len(samples), min(samples), max(samples),
             sum(samples), sum(v * v for v in samples))
    return data, stats

FIXTURES = [  # (name, width, height, color_type, filter schedule)
    ("img_a.png", 3, 2, 2, lambda y: 0),
    ("img_b.png", 7, 5, 6, lambda y: 0),
    ("img_c.png", 16, 16, 2, lambda y: 0),
    ("img_d.png", 1, 1, 6, lambda y: 0),
    ("img_e.png", 64, 48, 2, lambda y: 0),
    ("img_f.png", 120, 80, 6, lambda y: 0),
    # q167: every filter type exercised — img_g cycles 0..4 per scanline;
    # img_h leads with Paeth on row 0 (predictors all-zero edge case)
    ("img_g.png", 9, 7, 2, lambda y: y % 5),
    ("img_h.png", 5, 6, 6, lambda y: (y * 3 + 4) % 5),
]

def main():
    os.makedirs(OUT, exist_ok=True)
    rows, pix = [], []
    for name, w, h, ct, sched in FIXTURES:
        data, stats = png(w, h, ct, sched)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, w, h, 8, ct, len(data)))
        pix.append((name,) + stats)
        print(f"{name}: {w}x{h} ct={ct} {len(data)} bytes px={stats}")
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name,width,height,bit_depth,color_type,n_bytes\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    with open(os.path.join(OUT, "pixels.csv"), "w") as f:
        f.write("name,n_samples,px_min,px_max,px_sum,px_sumsq\n")
        for r in pix:
            f.write(",".join(str(x) for x in r) + "\n")

if __name__ == "__main__":
    main()
