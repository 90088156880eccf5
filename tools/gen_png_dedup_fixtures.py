#!/usr/bin/env python3
"""Generate the committed PNG near-dup fixture set for q200 (perceptual
image dedup via 64-bit average-hash).

Same discipline as gen_png_fixtures.py: handcrafted deterministic PNGs
(no imaging library), and a manifest that is ground truth BY
CONSTRUCTION — ahash.csv records each image's 64-bit average hash
computed here with the exact integer formula the Scala decoder uses
(luma = (299R+587G+114B)//1000, 8x8 box-average with cell = (y*8//h,
x*8//w), bit set iff cell avg > integer mean of the 64 cell avgs),
stored as SIGNED int64 for BIGINT parity.

The set plants three perceptual clusters and singletons:
  dup_a0/dup_a1/dup_a2 — one base, variants brighten 1-2 grid cells
  dup_b0/dup_b1       — second base, one-cell variant
  solo_c / solo_d / solo_e — unrelated bases
The generator ASSERTS the planted structure in hash space (within-
cluster hamming <= 3, cross-cluster >= 10), so the committed fixtures
can never drift from the query's banding guarantees (4x16-bit bands
catch every hamming<=3 pair by pigeonhole).
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png_dedup")
W = H = 32
NCHAN = 3  # color type 2 (RGB)


def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def base_pixels(k):
    """Deterministic RGB field for base index k (smooth + hash-ish mix)."""
    rows = []
    for y in range(H):
        row = []
        for x in range(W):
            row.extend([
                (x * 7 + y * 13 + 31 * k + ((x * y + k) % 11) * 9) % 256,
                (x * 3 + y * 5 + 57 * k + ((x + 2 * y + k) % 7) * 13) % 256,
                (x + y * 11 + 89 * k + ((3 * x + y + k) % 5) * 17) % 256,
            ])
        rows.append(row)
    return rows


def brighten_cell(rows, gx, gy, delta):
    """Push one 8x8-grid cell's pixels up by delta (clamped) — flips that
    cell's hash bit while barely moving the global mean."""
    out = [row[:] for row in rows]
    for y in range(gy * H // 8, (gy + 1) * H // 8):
        for x in range(gx * W // 8, (gx + 1) * W // 8):
            for c in range(NCHAN):
                i = x * NCHAN + c
                out[y][i] = min(255, out[y][i] + delta)
    return out


def ahash(rows):
    csum = [0] * 64
    ccnt = [0] * 64
    for y in range(H):
        gy = y * 8 // H
        for x in range(W):
            r, g, b = rows[y][x * 3], rows[y][x * 3 + 1], rows[y][x * 3 + 2]
            luma = (299 * r + 587 * g + 114 * b) // 1000
            c = (gy << 3) | (x * 8 // W)
            csum[c] += luma
            ccnt[c] += 1
    avg = [csum[c] // ccnt[c] for c in range(64)]
    mean = sum(avg) // 64
    h = 0
    for c in range(64):
        if avg[c] > mean:
            h |= 1 << c
    return h


def png_bytes(rows):
    raw = b""
    for row in rows:
        raw += b"\x00" + bytes(v & 0xFF for v in row)
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def signed64(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def main():
    os.makedirs(OUT, exist_ok=True)
    a0 = base_pixels(0)
    b0 = base_pixels(1)
    images = {
        "dup_a0.png": a0,
        "dup_a1.png": brighten_cell(a0, 2, 3, 90),
        "dup_a2.png": brighten_cell(a0, 5, 1, 90),
        "dup_b0.png": b0,
        "dup_b1.png": brighten_cell(b0, 0, 7, 90),
        "solo_c.png": base_pixels(2),
        "solo_d.png": base_pixels(3),
        "solo_e.png": base_pixels(4),
    }
    hashes = {n: ahash(rows) for n, rows in images.items()}

    def ham(a, b):
        return bin(hashes[a] ^ hashes[b]).count("1")

    clusters = [["dup_a0.png", "dup_a1.png", "dup_a2.png"],
                ["dup_b0.png", "dup_b1.png"]]
    names = sorted(images)
    planted = set()
    for cl in clusters:
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                planted.add(tuple(sorted((cl[i], cl[j]))))
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            pair = (names[i], names[j])
            d = ham(*pair)
            if pair in planted:
                assert d <= 3, f"planted pair {pair} drifted to hamming {d}"
            else:
                assert d >= 10, f"unrelated pair {pair} collides: hamming {d}"

    for n, rows in images.items():
        with open(os.path.join(OUT, n), "wb") as f:
            f.write(png_bytes(rows))
    with open(os.path.join(OUT, "ahash.csv"), "w") as f:
        f.write("name,ahash\n")
        for n in names:
            f.write(f"{n},{signed64(hashes[n])}\n")
    for n in names:
        print(n, hashes[n], [f"{p}:{ham(n, p)}" for p in names if p != n])


if __name__ == "__main__":
    main()
