#!/usr/bin/env python3
"""Generate the committed PNG fixture set for q144 (binaryFile ingest).

Handcrafted PNGs (signature + IHDR + IDAT(zlib) + IEND) — no imaging
library needed, fully deterministic bytes (zlib level 6, fixed pixel
formulas), so the fixtures and their manifest are stable across
regenerations. The manifest records the GENERATION parameters (name,
width, height, bit_depth, color_type) plus the written byte length —
ground truth by construction, which is what makes it a legitimate
oracle for the IHDR decode expression: the decoder is checked against
what the files were BUILT with, never against its own output.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png")

def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def png(width, height, color_type):
    nchan = {2: 3, 6: 4}[color_type]
    raw = b""
    for y in range(height):
        raw += b"\x00"  # filter type 0 per scanline
        for x in range(width):
            px = [(x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256,
                  (x + y * 11) % 256, (x * 17 + y) % 256][:nchan]
            raw += bytes(px)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))

FIXTURES = [  # (name, width, height, color_type)
    ("img_a.png", 3, 2, 2),
    ("img_b.png", 7, 5, 6),
    ("img_c.png", 16, 16, 2),
    ("img_d.png", 1, 1, 6),
    ("img_e.png", 64, 48, 2),
    ("img_f.png", 120, 80, 6),
]

def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for name, w, h, ct in FIXTURES:
        data = png(w, h, ct)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, w, h, 8, ct, len(data)))
        print(f"{name}: {w}x{h} ct={ct} {len(data)} bytes")
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name,width,height,bit_depth,color_type,n_bytes\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")

if __name__ == "__main__":
    main()
