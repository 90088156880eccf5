#!/usr/bin/env python3
"""Generate the committed AVI fixture set for q206 (video binary ingest).

Handcrafted minimal RIFF/AVI files — no codec, no video library: the
RIFF envelope, a LIST(hdrl) whose avih chunk carries the real header
fields (microseconds per frame, total frames, width, height), and an
empty LIST(movi) so the layout is spec-shaped. As with the PNG/WAV
sets, manifest.csv records the GENERATION parameters — ground truth by
construction for the avi_hdr decoder. One fixture (vid_d) places a JUNK
chunk before hdrl to prove the decoder walks the chunk list, and one
(vid_e) nests avih deeper in hdrl after a padding chunk.
"""
import os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "avi")


def chunk(tag, payload):
    return tag + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) % 2 else b"")


def lst(kind, payload):
    return chunk(b"LIST", kind + payload)


def avih(us_per_frame, frames, width, height):
    # 56-byte avih: us/frame, max rate, padding, flags, total frames,
    # initial frames, streams, suggested buffer, width, height, 4 reserved
    return struct.pack("<14I", us_per_frame, 0, 0, 0, frames, 0, 1, 0,
                       width, height, 0, 0, 0, 0)


def avi(us_per_frame, frames, width, height, pre=b"", hdr_pad=b""):
    hdrl = lst(b"hdrl", hdr_pad + chunk(b"avih",
               avih(us_per_frame, frames, width, height)))
    movi = lst(b"movi", b"")
    body = b"AVI " + pre + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


FIXTURES = [  # (name, us_per_frame, frames, width, height, pre, hdr_pad)
    ("vid_a.avi", 33333, 240, 640, 480, b"", b""),
    ("vid_b.avi", 41708, 96, 1920, 1080, b"", b""),
    ("vid_c.avi", 16667, 1200, 320, 240, b"", b""),
    ("vid_d.avi", 40000, 48, 1280, 720, chunk(b"JUNK", b"\x07" * 9), b""),
    ("vid_e.avi", 20000, 500, 854, 480, b"", chunk(b"IPAD", b"\x05" * 6)),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "manifest.csv"), "w") as mf:
        mf.write("name,us_per_frame,total_frames,width,height\n")
        for name, us, fr, w, h, pre, pad in FIXTURES:
            data = avi(us, fr, w, h, pre, pad)
            with open(os.path.join(OUT, name), "wb") as f:
                f.write(data)
            mf.write(f"{name},{us},{fr},{w},{h}\n")
            print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
