#!/usr/bin/env python3
"""Generate the committed WAV fixture set for q146 (audio binary ingest).

Handcrafted canonical RIFF/WAVE files (RIFF + fmt + data chunks) with
deterministic integer sample formulas — no audio library. As with the
PNG set (gen_png_fixtures.py), the manifest records the GENERATION
parameters plus written byte length: ground truth by construction, so
the wav_fmt decoder is checked against what the files were BUILT with.
One fixture (wav_e) puts a junk chunk before fmt to prove the decoder
walks the chunk list instead of assuming the canonical offset.
"""
import os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "wav")

def wav(sample_rate, channels, bits, n_frames, pre_chunks=()):
    bytes_per = bits // 8
    block = channels * bytes_per
    data = b""
    for i in range(n_frames):
        for c in range(channels):
            v = (i * 37 + c * 11) % (1 << bits)
            if bits == 16:
                v = ((i * 37 + c * 11) % 65536) - 32768
                data += struct.pack("<h", v)
            else:
                data += struct.pack("<B", v % 256)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    def chunk(tag, payload):
        # RIFF word alignment: odd-sized payloads carry a zero pad byte
        # (not counted in the chunk size but part of the stream), matching
        # the decoder's pos advance of 8 + size + (size & 1)
        return tag + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) % 2 else b"")

    chunks = b""
    for tag, payload in pre_chunks:
        chunks += chunk(tag, payload)
    chunks += chunk(b"fmt ", fmt)
    chunks += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

FIXTURES = [  # (name, sample_rate, channels, bits, n_frames, pre_chunks)
    ("wav_a.wav", 8000, 1, 8, 80, ()),
    ("wav_b.wav", 16000, 2, 16, 160, ()),
    ("wav_c.wav", 44100, 1, 16, 441, ()),
    ("wav_d.wav", 22050, 2, 8, 50, ()),
    ("wav_e.wav", 48000, 1, 16, 120, ((b"LIST", b"\x07" * 10),)),
    # odd-size junk payload: its pad byte exercises the decoder's
    # word-alignment advance (8 + size + (size & 1))
    ("wav_f.wav", 11025, 1, 8, 33, ((b"LIST", b"\x05" * 7),)),
]

def pcm_stats(sr, ch, bits, nf):
    """Expected PCM amplitude stats (q156's oracle), computed from the
    SAME sample formula wav() writes — ground truth by construction.
    8-bit WAV is unsigned with midpoint 128, so amp = v - 128; 16-bit is
    signed."""
    amps = []
    for i in range(nf):
        for c in range(ch):
            if bits == 16:
                amps.append(((i * 37 + c * 11) % 65536) - 32768)
            else:
                amps.append(((i * 37 + c * 11) % 256) - 128)
    n = len(amps)
    return (n, min(amps), max(amps), sum(amps), sum(a * a for a in amps))

def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "manifest.csv"), "w") as mf:
        mf.write("name,channels,sample_rate,bits_per_sample,n_frames,n_bytes,"
                 "n_samples,amp_min,amp_max,amp_sum,amp_sumsq\n")
        for name, sr, ch, bits, nf, pre in FIXTURES:
            data = wav(sr, ch, bits, nf, pre)
            with open(os.path.join(OUT, name), "wb") as f:
                f.write(data)
            n, mn, mx, s, sq = pcm_stats(sr, ch, bits, nf)
            mf.write(f"{name},{ch},{sr},{bits},{nf},{len(data)},"
                     f"{n},{mn},{mx},{s},{sq}\n")
            print(f"{name}: {sr}Hz x{ch} {bits}bit {nf}f {len(data)} bytes")

if __name__ == "__main__":
    main()
