#!/usr/bin/env python3
"""Independent Haar-band ground truth for q262 over the EXISTING
committed WAV fixtures (fixtures/wav/*.wav — this tool does NOT
regenerate them): decodes the PCM stream from the RIFF chunk list with
its own parser (not the Scala one), takes the first 64 channel-
interleaved amplitudes, runs the integer Haar transform (unnormalized
sum/difference pairs, 3 levels) and writes per-file band energies plus
the Parseval check to fixtures/wav/haar_manifest.csv — the oracle the
Spark-side declarative Haar must match bit-for-bit (the q156/q207
cross-validation contract). Files that are not PCM WAV or carry fewer
than 64 samples are skipped, mirroring wav_samples' null contract."""
import os
import struct
import sys

N = 64
FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "wav")


def decode(path):
    b = open(path, "rb").read()
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, bits, data = 12, -1, None
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        size = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if pos + 8 + size > len(b):
            return None
        if tag == b"fmt " and size >= 16:
            if struct.unpack("<H", b[pos + 8:pos + 10])[0] != 1:
                return None  # PCM only
            bits = struct.unpack("<H", b[pos + 22:pos + 24])[0]
        elif tag == b"data":
            data = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None or bits not in (8, 16):
        return None
    if bits == 8:
        return [v - 128 for v in data]
    n = len(data) // 2
    return [struct.unpack("<h", data[2 * i:2 * i + 2])[0] for i in range(n)]


def haar(s):
    e0 = sum(x * x for x in s)
    energies = []
    cur = s
    for _ in range(3):
        a = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        energies.append(sum(x * x for x in d))
        cur = a
    ea3 = sum(x * x for x in cur)
    ed1, ed2, ed3 = energies
    assert ea3 + ed3 + 2 * ed2 + 4 * ed1 == 8 * e0, "Parseval must hold"
    return e0, ed1, ed2, ed3, ea3


def main():
    rows = []
    for name in sorted(os.listdir(FIX)):
        if not name.endswith(".wav"):
            continue
        s = decode(os.path.join(FIX, name))
        if s is None or len(s) < N:
            continue
        e0, ed1, ed2, ed3, ea3 = haar(s[:N])
        rows.append((name, e0, ed1, ed2, ed3, ea3))
    out = os.path.join(FIX, "haar_manifest.csv")
    with open(out, "w") as f:
        f.write("name,e0,ed1,ed2,ed3,ea3,parseval_ok\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + ",true\n")
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    sys.exit(main())
