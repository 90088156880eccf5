#!/usr/bin/env python3
"""Independent ground truth for q266 over the EXISTING committed PNG
fixtures (fixtures/png/*.png — this tool does NOT regenerate them): a
from-scratch PNG decoder (zlib inflate + all five scanline filters,
including Paeth) feeding the same integer luma, 2x2 floor-mean
downsample, mergeable stats and position-weighted checksum the Scala
png_box2 expression computes — written to fixtures/png/box2_manifest.csv
as the oracle the Spark side must match bit-for-bit (the q262/gen_haar
cross-validation contract). Files the Scala decoder nulls (non-8-bit,
non-RGB(A), interlaced, malformed, or under 2x2 output) are skipped,
mirroring the null contract."""
import os
import struct
import sys
import zlib

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png")
SIG = b"\x89PNG\r\n\x1a\n"


def decode(path):
    b = open(path, "rb").read()
    if len(b) < 33 or b[:8] != SIG:
        return None
    if struct.unpack(">I", b[8:12])[0] != 13 or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    depth, ctype, comp, filt, inter = b[24], b[25], b[26], b[27], b[28]
    if depth != 8 or ctype not in (2, 6) or comp or filt or inter:
        return None
    if w <= 0 or h <= 0:
        return None
    nchan = 3 if ctype == 2 else 4
    pos, idat, ended = 33, b"", False
    while not ended and pos + 8 <= len(b):
        size = struct.unpack(">I", b[pos:pos + 4])[0]
        if pos + 12 + size > len(b):
            return None
        tag = b[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += b[pos + 8:pos + 8 + size]
        elif tag == b"IEND":
            ended = True
        pos += 12 + size
    if not idat:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w * nchan
    if len(raw) != h * (1 + stride):
        return None
    out = bytearray(h * stride)
    prior = bytearray(stride)
    for y in range(h):
        base = y * (1 + stride)
        f = raw[base]
        if f > 4:
            return None
        cur = bytearray(raw[base + 1:base + 1 + stride])
        for i in range(stride):
            left = cur[i - nchan] if i >= nchan else 0
            up = prior[i]
            ul = prior[i - nchan] if i >= nchan else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else \
                    (up if pb <= pc else ul)
            cur[i] = (cur[i] + pred) & 0xFF
        out[y * stride:(y + 1) * stride] = cur
        prior = cur
    return w, h, nchan, bytes(out)


def box2(w, h, nchan, px):
    if w < 2 or h < 2:
        return None
    stride = w * nchan

    def luma(x, y):
        o = y * stride + x * nchan
        return (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000

    ow, oh = w // 2, h // 2
    n = mn = mx = s = sq = chk = 0
    mn = None
    for oy in range(oh):
        for ox in range(ow):
            v = (luma(2 * ox, 2 * oy) + luma(2 * ox + 1, 2 * oy) +
                 luma(2 * ox, 2 * oy + 1) +
                 luma(2 * ox + 1, 2 * oy + 1)) // 4
            mn = v if mn is None or v < mn else mn
            mx = max(mx, v)
            s += v
            sq += v * v
            chk += v * (oy * ow + ox + 1)
            n += 1
    return ow, oh, n, mn, mx, s, sq, chk


def main():
    rows = []
    for name in sorted(os.listdir(FIX)):
        if not name.endswith(".png"):
            continue
        d = decode(os.path.join(FIX, name))
        if d is None:
            continue
        r = box2(*d)
        if r is None:
            continue
        rows.append((name,) + r)
    out = os.path.join(FIX, "box2_manifest.csv")
    with open(out, "w") as f:
        f.write("name,out_w,out_h,n_px,px_min,px_max,px_sum,px_sumsq,"
                "checksum\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    sys.exit(main())
