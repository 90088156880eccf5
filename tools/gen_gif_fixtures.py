#!/usr/bin/env python3
"""Generate the committed GIF fixture set for q330 (block walk) / q331
(LZW decode to an exact RGB surface).

Files are REAL GIF87a/89a at the bitstream level: Logical Screen
Descriptor, global/local color tables, extension sub-block chains, image
descriptors and variable-width LSB-first LZW with CLEAR/END codes,
dictionary growth to 4096 and mid-stream CLEAR resets. Index surfaces
and palettes are chosen DIRECTLY by deterministic formula, so the
expected RGB stats/CRC are computed from the same mapping the Scala
decoder applies.

Independent validation (the gen_jpeg_decode_fixtures.py discipline): a
standalone LZW re-decoder below re-reads every emitted stream and
asserts the index round-trip before the manifest is written.

Planted corruption (not in the manifest): corrupt_trunc.gif is cut
mid-sub-block; corrupt_code.gif carries an out-of-range LZW code;
corrupt_trailer.gif has bytes after 0x3B — each must void exactly
itself.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "gif")


def palette(bits, seed):
    n = 1 << bits
    return bytes(
        v for i in range(n)
        for v in ((i * 7 + seed) % 256, (i * 13 + 2 * seed) % 256,
                  (i * 29 + 3 * seed) % 256))


def indexes(w, h, nidx, kind, seed):
    """Deterministic index surface. 'runs' is LZW-friendly (exercises
    long matches), 'noise' grows the dictionary fast (exercises width
    growth + CLEAR resets on big files)."""
    px = []
    for y in range(h):
        for x in range(w):
            if kind == "runs":
                px.append(((x // 7) + (y // 5) + seed) % nidx)
            else:  # noise
                px.append((x * 31 + y * 17 + (x * y + seed) // 3) % nidx)
    return px


class LzwEncoder:
    """Variable-width GIF LZW, LSB-first. THE width-sync subtlety: the
    DECODER adds no dictionary entry for the first data code after a
    CLEAR, so its entry count — which drives the 2^w width bumps — lags
    the encoder's own dictionary by one. The encoder therefore tracks
    the DECODER'S add schedule (dec_free / dec_started) and widens its
    output codes exactly when the decoder will; its own dictionary is
    used only for string matching and the 4096 CLEAR decision."""

    def __init__(self, min_code):
        self.min = min_code
        self.clear = 1 << min_code
        self.end = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nb = 0
        self.reset()

    def reset(self):
        self.dict = {(-1, k): k for k in range(self.clear)}
        self.next_free = self.end + 1
        self.w = self.min + 1
        self.dec_free = self.end + 1
        self.dec_started = False

    def put(self, code):
        self.acc |= code << self.nb
        self.nb += self.w
        while self.nb >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nb -= 8

    def put_data(self, code):
        """Emit a data code, then advance the decoder-mirrored width
        schedule (the decoder adds an entry after every data code except
        the first since CLEAR)."""
        self.put(code)
        if self.dec_started:
            self.dec_free += 1
            if self.dec_free == (1 << self.w) and self.w < 12:
                self.w += 1
        else:
            self.dec_started = True

    def flush(self):
        if self.nb:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nb = 0

    def encode(self, px):
        self.put(self.clear)
        prev = -1
        for k in px:
            if (prev, k) in self.dict:
                prev = self.dict[(prev, k)]
                continue
            self.put_data(prev)
            self.dict[(prev, k)] = self.next_free
            self.next_free += 1
            if self.next_free == 4096:
                self.put(self.clear)
                self.reset()
            prev = self.dict[(-1, k)]
        if prev != -1:
            self.put_data(prev)
        self.put(self.end)
        self.flush()
        return bytes(self.out)


def sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def interlace_rows(h):
    """GIF's 4-pass row storage order."""
    return ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)] +
            [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])


def build_gif(w, h, pal_bits, kind, seed, v89=True, lct=False,
              extensions=(), min_code=None, interlace=False):
    nidx = 1 << pal_bits
    pal = palette(pal_bits, seed)
    px = indexes(w, h, nidx, kind, seed)
    # the LZW stream carries the STORAGE order; stats/CRC stay logical
    stream_px = px
    if interlace:
        stream_px = []
        for r in interlace_rows(h):
            stream_px.extend(px[r * w:(r + 1) * w])
    mc = min_code if min_code is not None else max(2, pal_bits)
    data = b"GIF89a" if v89 else b"GIF87a"
    flags_gct = 0 if lct else (0x80 | (pal_bits - 1))
    data += struct.pack("<HH", w, h) + bytes([flags_gct, 1 if not lct else 0, 0])
    if not lct:
        data += pal
    for label, payload in extensions:
        data += bytes([0x21, label]) + sub_blocks(payload)
    iflags = ((0x80 | (pal_bits - 1)) if lct else 0) | (0x40 if interlace else 0)
    data += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    if lct:
        data += pal
    enc = LzwEncoder(mc)
    lzw = enc.encode(stream_px)
    data += bytes([mc]) + sub_blocks(lzw)
    data += bytes([0x3B])

    # expected RGB stats via the palette mapping
    pmin, pmax, psum, psq = 255, 0, 0, 0
    crc = zlib.crc32(b"") & 0xFFFFFFFF
    rgb = bytearray()
    for idx in px:
        for c in range(3):
            v = pal[3 * idx + c]
            pmin = min(pmin, v)
            pmax = max(pmax, v)
            psum += v
            psq += v * v
            rgb.append(v)
    crc = zlib.crc32(bytes(rgb)) & 0xFFFFFFFF
    stats = dict(width=w, height=h, palette_size=nidx,
                 interlaced=str(bool(interlace)).lower(),
                 n_clears=count_clears(stream_px, mc),
                 px_min=pmin, px_max=pmax, px_sum=psum, px_sqsum=psq,
                 px_crc32=crc)
    return data, stream_px, pal, stats, lzw


def count_clears(px, mc):
    """Replay the encoder's CLEAR accounting (initial CLEAR + resets)."""
    enc = LzwEncoder(mc)
    clears = 1
    prev = -1
    for k in px:
        if (prev, k) in enc.dict:
            prev = enc.dict[(prev, k)]
            continue
        enc.dict[(prev, k)] = enc.next_free
        enc.next_free += 1
        if enc.next_free == (1 << enc.w) and enc.w < 12:
            enc.w += 1
        if enc.next_free == 4096:
            clears += 1
            enc.reset()
        prev = enc.dict[(-1, k)]
    return clears


# --- independent LZW re-decoder (mirrors the DECODER algorithm) --------
def lzw_decode(lzw, mc, n_expected, n_roots):
    clear = 1 << mc
    end = clear + 1
    prefix = [0] * 4096
    suffix = [0] * 4096
    next_free = end + 1
    w = mc + 1
    acc = 0
    nb = 0
    i = 0
    out = []
    prev = -1

    def first(c):
        while c >= clear:
            c = prefix[c]
        return c

    def emit(c):
        stack = []
        while c >= clear:
            stack.append(suffix[c])
            c = prefix[c]
        assert c < n_roots
        out.append(c)
        out.extend(reversed(stack))

    while True:
        while nb < w:
            assert i < len(lzw), "ran out of bits before END"
            acc |= lzw[i] << nb
            i += 1
            nb += 8
        code = acc & ((1 << w) - 1)
        acc >>= w
        nb -= w
        if code == clear:
            next_free = end + 1
            w = mc + 1
            prev = -1
        elif code == end:
            break
        elif prev == -1:
            assert code < clear and code < n_roots
            out.append(code)
            prev = code
        elif next_free >= 4096:
            assert code < next_free
            emit(code)
            prev = code
        else:
            assert code <= next_free
            if code < next_free:
                emit(code)
                suffix[next_free] = first(code)
            else:
                emit(prev)
                out.append(first(prev))
                suffix[next_free] = first(prev)
            prefix[next_free] = prev
            next_free += 1
            if next_free == (1 << w) and w < 12:
                w += 1
            prev = code
    assert len(out) == n_expected, (len(out), n_expected)
    return out


def extract_lzw(data):
    """Pull the (min_code, concatenated lzw bytes) of the first image."""
    i = 13
    flags = data[10]
    if flags & 0x80:
        i += 3 * (1 << ((flags & 7) + 1))
    while True:
        b0 = data[i]
        if b0 == 0x21:
            i += 2
            while data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b0 == 0x2C:
            iflags = data[i + 9]
            i += 10
            if iflags & 0x80:
                i += 3 * (1 << ((iflags & 7) + 1))
            mc = data[i]
            i += 1
            lzw = bytearray()
            while data[i] != 0:
                ln = data[i]
                lzw += data[i + 1:i + 1 + ln]
                i += 1 + ln
            return mc, bytes(lzw)
        else:
            raise AssertionError(hex(b0))


def info_row(w, h, v89, lct, pal, exts, lzw, interlace=False):
    """q330's structural fields from BUILD INTENT (not from re-parsing
    the emitted bytes): the decoder is checked against what the file
    was built with."""
    import math
    data_bytes = len(lzw) + sum(len(p) for _, p in exts)
    n_sub = math.ceil(len(lzw) / 255) + sum(
        math.ceil(len(p) / 255) for _, p in exts)
    return dict(
        width=w, height=h, gif89a=str(v89).lower(),
        gct_size=0 if lct else len(pal) // 3,
        gct_crc32=0 if lct else (zlib.crc32(pal) & 0xFFFFFFFF),
        n_images=1, n_extensions=len(exts),
        n_gce=sum(1 for l, _ in exts if l == 0xF9),
        n_lct=1 if lct else 0, n_interlaced=1 if interlace else 0,
        data_bytes=data_bytes, n_sub_blocks=n_sub)


def main():
    os.makedirs(OUT, exist_ok=True)
    specs = [
        # name, w, h, bits, kind, seed, 89a, lct, extensions, min_code
        ("gif_runs.gif", 64, 48, 4, "runs", 3, True, False,
         [(0xFE, b"graft fixture")], None),
        ("gif_small87.gif", 16, 16, 2, "runs", 9, False, False, [], None),
        ("gif_lct.gif", 32, 24, 5, "runs", 7, True, True,
         [(0xF9, bytes([0, 0, 0, 0]))], None),
        ("gif_noise.gif", 96, 80, 7, "noise", 5, True, False, [], None),
        # 8-bit noise large enough to fill the dictionary -> CLEAR reset
        ("gif_reset.gif", 128, 128, 8, "noise", 11, True, False,
         [(0xFF, b"NETSCAPE2.0")], None),
        ("gif_mc_gt.gif", 24, 16, 2, "runs", 13, True, False, [], 4),
    ]
    inter_spec = ("gif_interlaced.gif", 48, 40, 4, "runs", 17, True, False,
                  [], None)
    rows = []
    info_rows = []
    for name, w, h, bits, kind, seed, v89, lct, exts, mc in specs + [inter_spec]:
        inter = name == "gif_interlaced.gif"
        data, px, pal, stats, lzw0 = build_gif(w, h, bits, kind, seed, v89,
                                               lct, exts, mc, interlace=inter)
        mc2, lzw = extract_lzw(data)
        assert lzw == lzw0
        redec = lzw_decode(lzw, mc2, w * h, 1 << bits)
        assert redec == px, f"{name}: LZW round-trip failed"
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        rows.append((name, stats, len(data)))
        info_rows.append((name, info_row(w, h, v89, lct, pal, exts, lzw,
                          interlace=inter), len(data)))
        if name == "gif_reset.gif":
            assert stats["n_clears"] >= 2, "reset fixture never cleared"

    # animation (3 DISTINCT frames): q330 walks it, q331 voids it,
    # q334's gif_frames decodes every frame — frame 0 renders through
    # the GCT, frames 1-2 carry their own LCTs, frame 1 is INTERLACED
    w_a, h_a = 16, 16
    gct_bits, gct_seed = 3, 19
    gct_pal = palette(gct_bits, gct_seed)
    anim2 = b"GIF89a" + struct.pack("<HH", w_a, h_a) + \
        bytes([0x80 | (gct_bits - 1), 0, 0]) + gct_pal
    frame_specs = [  # (pal_bits, pal_seed, px_seed, interlace, lct)
        (3, 19, 19, False, False),
        (4, 31, 24, True, True),
        (2, 37, 29, False, True),
    ]
    anim_frames = []
    anim_data_bytes = 0
    anim_subs = 0
    for fi, (pb, ps, xs, il, lct) in enumerate(frame_specs):
        nidx = 1 << pb
        pal = palette(pb, ps) if lct else gct_pal
        eff_n = nidx if lct else (1 << gct_bits)
        px = indexes(w_a, h_a, eff_n, "runs", xs)
        stream_px = px
        if il:
            stream_px = []
            for r in interlace_rows(h_a):
                stream_px.extend(px[r * w_a:(r + 1) * w_a])
        mc = max(2, pb if lct else gct_bits)
        iflags = ((0x80 | (pb - 1)) if lct else 0) | (0x40 if il else 0)
        anim2 += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w_a, h_a) + \
            bytes([iflags])
        if lct:
            anim2 += pal
        enc = LzwEncoder(mc)
        lzw = enc.encode(stream_px)
        anim2 += bytes([mc]) + sub_blocks(lzw)
        anim_data_bytes += len(lzw)
        anim_subs += max(1, (len(lzw) + 254) // 255)
        pmin, pmax, psum, psq = 255, 0, 0, 0
        rgb = bytearray()
        for idx in px:
            for c in range(3):
                v = pal[3 * idx + c]
                pmin = min(pmin, v); pmax = max(pmax, v)
                psum += v; psq += v * v
                rgb.append(v)
        anim_frames.append(dict(
            frame=fi, width=w_a, height=h_a,
            palette_size=(nidx if lct else (1 << gct_bits)),
            interlaced=str(bool(il)).lower(),
            n_clears=count_clears(stream_px, mc),
            px_min=pmin, px_max=pmax, px_sum=psum, px_sqsum=psq,
            px_crc32=zlib.crc32(bytes(rgb)) & 0xFFFFFFFF))
    anim2 += bytes([0x3B])
    with open(os.path.join(OUT, "gif_anim.gif"), "wb") as f:
        f.write(anim2)
    anim_info = info_row(w_a, h_a, True, False, gct_pal, [], b"")
    anim_info["n_images"] = 3
    anim_info["n_lct"] = 2
    anim_info["n_interlaced"] = 1
    anim_info["data_bytes"] = anim_data_bytes
    anim_info["n_sub_blocks"] = anim_subs
    info_rows.append(("gif_anim.gif", anim_info, len(anim2)))

    # per-frame manifest (q334): every good fixture's frames — the
    # single-frame files contribute their frame-0 row (identical stats
    # to manifest.csv by construction), the animation its three
    fcols = ["frame", "width", "height", "palette_size", "interlaced",
             "n_clears", "px_min", "px_max", "px_sum", "px_sqsum",
             "px_crc32"]
    frame_rows = []
    for name, st, nb in rows:
        fr = dict(st)
        fr["frame"] = 0
        frame_rows.append((name, fr))
    for fr in anim_frames:
        frame_rows.append(("gif_anim.gif", fr))
    with open(os.path.join(OUT, "manifest_frames.csv"), "w") as f:
        f.write("name," + ",".join(fcols) + "\n")
        for name, st in sorted(frame_rows, key=lambda t: (t[0], t[1]["frame"])):
            f.write(f"{name}," + ",".join(str(st[c]) for c in fcols) + "\n")

    # corruptions (not in the manifest)
    good, _, good_pal, _, good_lzw = build_gif(32, 32, 4, "runs", 5)
    with open(os.path.join(OUT, "corrupt_trunc.gif"), "wb") as f:
        f.write(good[:len(good) - 9])
    # out-of-range code: patch the first LZW data byte stream with 0xFF
    # bits so an undefined dictionary code appears
    bad = bytearray(good)
    mc2, lzw = extract_lzw(good)
    # find first data sub-block of the image and stomp its payload
    pos = good.index(bytes([mc2]), 13) + 2  # min_code byte + length byte
    for k in range(4):
        bad[pos + 3 + k] = 0xFF
    with open(os.path.join(OUT, "corrupt_code.gif"), "wb") as f:
        f.write(bytes(bad))
    # structure intact, LZW rotten: q330 must still walk it
    info_rows.append(("corrupt_code.gif",
                      info_row(32, 32, True, False, good_pal, [], good_lzw),
                      len(bad)))
    with open(os.path.join(OUT, "corrupt_trailer.gif"), "wb") as f:
        f.write(good + b"xx")

    cols = ["width", "height", "palette_size", "interlaced", "n_clears",
            "px_min", "px_max", "px_sum", "px_sqsum", "px_crc32"]
    with open(os.path.join(OUT, "manifest.csv"), "w") as f:
        f.write("name," + ",".join(cols) + ",n_bytes\n")
        for name, st, nb in sorted(rows):
            f.write(f"{name}," + ",".join(str(st[c]) for c in cols) + f",{nb}\n")
    icols = ["width", "height", "gif89a", "gct_size", "gct_crc32",
             "n_images", "n_extensions", "n_gce", "n_lct", "n_interlaced",
             "data_bytes", "n_sub_blocks"]
    with open(os.path.join(OUT, "manifest_info.csv"), "w") as f:
        f.write("name," + ",".join(icols) + ",n_bytes\n")
        for name, st, nb in sorted(info_rows):
            f.write(f"{name}," + ",".join(str(st[c]) for c in icols) + f",{nb}\n")
    print(f"wrote {len(rows)} good + 1 anim + 3 corrupt gif fixtures to {OUT}")


if __name__ == "__main__":
    main()
