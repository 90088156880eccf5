#!/usr/bin/env python3
"""Generate the committed AVI near-dup fixture set for q207 (video-level
perceptual dedup over per-frame average-hashes).

Same discipline as gen_png_dedup_fixtures.py / gen_avi_fixtures.py:
handcrafted RIFF/AVI files with REAL frame payloads — each frame is a
16x16 single-channel luma grid stored as an uncompressed `00db` chunk
inside LIST(movi) — and a manifest that is ground truth BY CONSTRUCTION:
sample_hash.csv records, for every frame the q206 uniform-8 sample plan
picks (stride = max(1, frames // 8), indices i*stride), the 64-bit
average-hash computed here with the exact integer formula the Scala
decoder uses (8x8 box cells, cell = (y*8//h << 3) | x*8//w, bit set iff
cell avg > integer mean of the 64 cell avgs), stored SIGNED for BIGINT
parity.

The set plants two near-dup clusters and unrelated singletons:
  clip_a0 / clip_a1 / clip_a2 — one base video; the variants model a
      RE-ENCODE: every frame gets one grid cell brightened (a0→a1) or
      a different cell on a different schedule (a0→a2), so every
      sampled frame-hash lands within a few bits of the original's
  clip_b0 / clip_b1           — second base, one-cell re-encode
  solo_c / solo_d             — unrelated bases (solo_d also has a
      different frame count, so its sample plan differs too)
  clip_a3_trim                — clip_a0 with the first 4 frames CUT
      (bit-identical remaining frames) — the common trimmed re-upload.
      q207's ordinal alignment structurally MISSES it (asserted); the
      q210 order-free frame-hash-set leg catches it (asserted).
The generator ASSERTS the planted structure in hash space: within a
cluster EVERY aligned sampled frame is hamming <= 3 (so the clip-level
matched fraction is 8/8); across clusters FEWER than 3/4 of aligned
samples are within 3 (in fact none are <= 3 — asserted), so the q207
threshold (matched*4 >= n_samples*3) separates exactly the planted
pairs. Fixtures can therefore never drift from the query's banding +
fraction guarantees.

Round-10 additions for q210 (temporal-offset-robust matching):
frame_hash.csv records EVERY frame's average-hash (the fixed-rate
ingest pass — rate = every frame at fixture scale), and the generator
asserts the q210 contract end-to-end: the trim pair's exact
frame-hash-set Jaccard clears the 0.5 threshold, every other pair —
including the re-encodes, whose exact hash VALUES all differ — stays at
Jaccard 0 (no shared hash at all), AND the deterministic q63-style
MinHash banding (16 md5-slice hashes, 4 bands of 4, string min) puts
the trim pair in a shared band bucket so the banded candidate join
provably recalls it.
"""
import hashlib, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "avi_dedup")
TRIM_JACCARD = 0.7  # q210 threshold (keep in sync with Multimodal)
W = H = 16
US_PER_FRAME = 33333


def chunk(tag, payload):
    return tag + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) % 2 else b"")


def lst(kind, payload):
    return chunk(b"LIST", kind + payload)


def avih(us_per_frame, frames, width, height):
    return struct.pack("<14I", us_per_frame, 0, 0, 0, frames, 0, 1, 0,
                       width, height, 0, 0, 0, 0)


def avi(frames_px):
    """Build an AVI whose movi list holds one 00db luma chunk per frame."""
    n = len(frames_px)
    hdrl = lst(b"hdrl", chunk(b"avih", avih(US_PER_FRAME, n, W, H)))
    movi = lst(b"movi", b"".join(
        chunk(b"00db", bytes(v & 0xFF for row in f for v in row))
        for f in frames_px))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def base_frame(k, t):
    """Deterministic luma field for base clip k at frame t (video-like:
    content drifts with t so consecutive frames differ)."""
    return [[(x * 7 + y * 13 + 31 * k + 5 * t
              + ((x * y + k + t) % 11) * 9) % 256
             for x in range(W)] for y in range(H)]


def brighten_cell(frame, gx, gy, delta):
    """Push one 8x8-grid cell's pixels up by delta (clamped) — flips that
    cell's hash bit while barely moving the global mean. With W=H=16 a
    grid cell is a 2x2 pixel block."""
    out = [row[:] for row in frame]
    for y in range(gy * H // 8, (gy + 1) * H // 8):
        for x in range(gx * W // 8, (gx + 1) * W // 8):
            out[y][x] = min(255, out[y][x] + delta)
    return out


def ahash(frame):
    csum = [0] * 64
    ccnt = [0] * 64
    for y in range(H):
        gy = y * 8 // H
        for x in range(W):
            c = (gy << 3) | (x * 8 // W)
            csum[c] += frame[y][x]
            ccnt[c] += 1
    avg = [csum[c] // ccnt[c] for c in range(64)]
    mean = sum(avg) // 64
    h = 0
    for c in range(64):
        if avg[c] > mean:
            h |= 1 << c
    return h


def sample_plan(n_frames):
    stride = max(1, n_frames // 8)
    return [i * stride for i in range((n_frames - 1) // stride + 1)]


def signed64(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def main():
    os.makedirs(OUT, exist_ok=True)
    a = [base_frame(0, t) for t in range(24)]
    b = [base_frame(1, t) for t in range(24)]
    clips = {
        "clip_a0.avi": a,
        # re-encode A→1: same cell brightened in every frame
        "clip_a1.avi": [brighten_cell(f, 2, 3, 90) for f in a],
        # re-encode A→2: cell varies with frame index
        "clip_a2.avi": [brighten_cell(f, (3 + t) % 8, 1, 90)
                        for t, f in enumerate(a)],
        "clip_b0.avi": b,
        "clip_b1.avi": [brighten_cell(f, 0, 7, 90) for f in b],
        "solo_c.avi": [base_frame(2, t) for t in range(24)],
        "solo_d.avi": [base_frame(3, t) for t in range(40)],
        # trimmed re-upload of A: first 4 frames cut, rest bit-identical
        "clip_a3_trim.avi": a[4:],
    }
    names = sorted(clips)
    hashes = {}  # name -> {sample_idx: hash}
    for n, frames in clips.items():
        hashes[n] = {i: ahash(frames[i]) for i in sample_plan(len(frames))}

    clusters = [["clip_a0.avi", "clip_a1.avi", "clip_a2.avi"],
                ["clip_b0.avi", "clip_b1.avi"]]
    planted = set()
    for cl in clusters:
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                planted.add(tuple(sorted((cl[i], cl[j]))))
    trim_pair = tuple(sorted(("clip_a0.avi", "clip_a3_trim.avi")))
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            pa, pb = names[i], names[j]
            ha, hb = hashes[pa], hashes[pb]
            aligned = sorted(set(ha) & set(hb))
            close = [s for s in aligned
                     if bin(ha[s] ^ hb[s]).count("1") <= 3]
            n_samples = max(len(ha), len(hb))
            if (pa, pb) in planted:
                assert len(close) == len(aligned) == n_samples, \
                    f"planted pair ({pa},{pb}) drifted: " \
                    f"{len(close)}/{len(aligned)}/{n_samples}"
            elif "clip_a3_trim.avi" in (pa, pb):
                # the trim's ordinal misalignment: q207's >= 3/4 aligned
                # criterion must FAIL for every pair involving it — the
                # design limit q210 exists to close
                assert len(close) * 4 < n_samples * 3, \
                    f"trim pair ({pa},{pb}) unexpectedly aligns: " \
                    f"{len(close)}/{n_samples}"
            else:
                assert len(close) == 0, \
                    f"unrelated pair ({pa},{pb}) collides on {len(close)} " \
                    f"sampled frames"

    # ---- q210 planted structure: exact frame-hash SETS (order-free) ----
    full = {n: [ahash(f) for f in frames] for n, frames in clips.items()}
    sets = {n: set(map(str, hs)) for n, hs in
            ((n, [signed64(h) for h in hs]) for n, hs in full.items())}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            pa, pb = names[i], names[j]
            inter = len(sets[pa] & sets[pb])
            union = len(sets[pa] | sets[pb])
            jac = inter / union
            if (pa, pb) == trim_pair:
                assert jac >= TRIM_JACCARD, \
                    f"trim pair Jaccard {jac:.3f} below threshold"
            else:
                # a re-encode changes SOME frames' exact hash value (a
                # brightened cell doesn't always cross the mean), so
                # same-base pairs sit at partial overlap — (a1,a2)
                # measures 0.500, the worst case — and cross-base pairs
                # at most an incidental single collision (~0.02): both
                # asserted at least 0.2 BELOW the 0.7 threshold, so the
                # separation has real margin on both sides (trim pair
                # is at 0.833). Re-encodes are q207's aligned leg.
                assert inter * 2 <= union, \
                    f"({pa},{pb}) Jaccard {jac:.3f} too close to threshold"

    # deterministic q63-style MinHash banding (16 md5-slice hashes as
    # 8-hex-char strings, 4 bands of 4, lexicographic string min) must
    # put the trim pair in at least one shared band bucket — the banded
    # candidate join's recall of the one planted pair is PROVEN here,
    # not hoped for (keep the formula in sync with Multimodal/q63)
    def band_keys(elements):
        sig = [min(hashlib.md5(f"{m}_{s}".encode()).hexdigest()[p*8:p*8+8]
                   for s in elements)
               for m in range(4) for p in range(4)]
        return ["|".join(sig[b * 4 + p] for p in range(4)) for b in range(4)]
    shared_bands = [b for b in range(4)
                    if band_keys(sets[trim_pair[0]])[b]
                    == band_keys(sets[trim_pair[1]])[b]]
    assert shared_bands, "trim pair shares no MinHash band bucket"
    print("trim pair shares band(s)", shared_bands,
          f"set-jaccard {len(sets[trim_pair[0]] & sets[trim_pair[1]])}"
          f"/{len(sets[trim_pair[0]] | sets[trim_pair[1]])}")

    for n, frames in clips.items():
        with open(os.path.join(OUT, n), "wb") as f:
            f.write(avi(frames))
    with open(os.path.join(OUT, "sample_hash.csv"), "w") as f:
        f.write("name,sample_idx,ahash\n")
        for n in names:
            for s in sorted(hashes[n]):
                f.write(f"{n},{s},{signed64(hashes[n][s])}\n")
    with open(os.path.join(OUT, "frame_hash.csv"), "w") as f:
        f.write("name,frame_idx,ahash\n")
        for n in names:
            for t, h in enumerate(full[n]):
                f.write(f"{n},{t},{signed64(h)}\n")
    for n in names:
        print(n, len(clips[n]), "frames,",
              len(hashes[n]), "samples,",
              os.path.getsize(os.path.join(OUT, n)), "bytes")


if __name__ == "__main__":
    main()
