#!/usr/bin/env python3
"""Generate the committed WAV near-dup fixture set for q201 (perceptual
audio dedup via the 64-window loudness-envelope fingerprint).

Same discipline as gen_png_dedup_fixtures.py: handcrafted deterministic
mono 16-bit PCM WAVs (no audio library) and a manifest that is ground
truth BY CONSTRUCTION — fingerprint.csv records each clip's 64-bit
fingerprint computed here with the exact integer formula the Scala
decoder uses (64 equal sample windows, per-window mean |amplitude| by
integer division, bit set iff window mean > integer mean of the 64
window means), stored as SIGNED int64 for BIGINT parity.

Clips are amplitude-MODULATED tones (the envelope carries the
fingerprint; a flat tone would leave every window at the same mean and
the bits to noise). Variants add small deterministic pseudo-noise
(plus one uniform-gain variant — the envelope-relative compare shrugs
off volume changes). The generator ASSERTS within-cluster hamming <= 3
and cross-cluster >= 10, so committed fixtures can never drift from
the query's 4x16-bit banding guarantee.
"""
import math, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "wav_dedup")
SR = 8000
N = 6400  # 100 samples per fingerprint window


def tone(f1, f2, env_cycles, phase):
    """Amplitude-modulated two-tone clip, int16 samples."""
    out = []
    for i in range(N):
        env = 0.55 + 0.45 * math.sin(2 * math.pi * env_cycles * i / N + phase)
        v = env * (9000 * math.sin(2 * math.pi * f1 * i / SR)
                   + 5000 * math.sin(2 * math.pi * f2 * i / SR))
        out.append(max(-32768, min(32767, int(round(v)))))
    return out


def with_noise(samples, seed):
    """Additive deterministic pseudo-noise, +/-200 of 32767."""
    out = []
    for i, v in enumerate(samples):
        n = ((i * 2654435761 + seed * 40503) % 401) - 200
        out.append(max(-32768, min(32767, v + n)))
    return out


def with_gain(samples, num, den):
    return [max(-32768, min(32767, v * num // den)) for v in samples]


def fingerprint(samples):
    n = len(samples)
    wsum = [0] * 64
    wcnt = [0] * 64
    for i, v in enumerate(samples):
        w = i * 64 // n
        wsum[w] += abs(v)
        wcnt[w] += 1
    avg = [wsum[w] // wcnt[w] for w in range(64)]
    mean = sum(avg) // 64
    h = 0
    for w in range(64):
        if avg[w] > mean:
            h |= 1 << w
    return h


def wav_bytes(samples):
    data = b"".join(struct.pack("<h", v) for v in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)

    def chunk(tag, payload):
        return tag + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) % 2 else b"")

    chunks = chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def signed64(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def main():
    os.makedirs(OUT, exist_ok=True)
    a = tone(440, 1170, 3, 0.0)
    b = tone(523, 880, 5, 1.1)
    clips = {
        "dup_a0.wav": a,
        "dup_a1.wav": with_noise(a, 1),
        "dup_a2.wav": with_gain(a, 3, 4),  # -2.5 dB re-master
        "dup_b0.wav": b,
        "dup_b1.wav": with_noise(b, 2),
        "solo_c.wav": tone(330, 1568, 7, 2.2),
        "solo_d.wav": tone(660, 987, 2, 0.7),
        "solo_e.wav": tone(392, 1319, 9, 1.9),
    }
    hashes = {n: fingerprint(s) for n, s in clips.items()}

    def ham(x, y):
        return bin(hashes[x] ^ hashes[y]).count("1")

    clusters = [["dup_a0.wav", "dup_a1.wav", "dup_a2.wav"],
                ["dup_b0.wav", "dup_b1.wav"]]
    names = sorted(clips)
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

    for n, s in clips.items():
        with open(os.path.join(OUT, n), "wb") as f:
            f.write(wav_bytes(s))
    with open(os.path.join(OUT, "fingerprint.csv"), "w") as f:
        f.write("name,fingerprint\n")
        for n in names:
            f.write(f"{n},{signed64(hashes[n])}\n")
    for n in names:
        print(n, hashes[n], [f"{p}:{ham(n, p)}" for p in names if p != n])


if __name__ == "__main__":
    main()
