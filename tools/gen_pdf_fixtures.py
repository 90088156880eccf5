#!/usr/bin/env python3
"""Generate the committed PDF fixture set for q209 (PDF text extraction).

Handcrafted, structurally valid PDFs — objects, xref table, trailer — no
PDF library. Content streams carry the exactly-specifiable extraction
core: BT..ET text objects with Tj / TJ show operators and Td / TD / T*
line moves; some streams are FlateDecode-compressed (plain zlib), some
uncompressed; one object is an /Image XObject stream that must be walked
past but never scanned for text.

Ground-truth discipline (the q144/q200/q207 contract): each fixture's
EXPECTED text is declared here as a literal, the manifest records the
derived values (counts, md5, head), and — the independent-extraction
gate — this tool re-opens every file it wrote and runs `extract()`, a
standalone mini-parser implemented from the PDF spec (not from the
builder's variables), asserting it reproduces the declared text exactly.
The Scala decoder (graft.functions.PdfText) is then oracle-checked
against the same manifest, so builder, independent Python parser, and
Scala parser must all agree before anything lands.

Extraction semantics (mirrored bit-for-bit by PdfText.scala — keep in
sync):
  - every `<< .. >> stream .. endstream` object is walked in file order
    (direct integer /Length only); /Subtype /Image streams count toward
    n_streams but are not scanned;
  - /FlateDecode streams are zlib-inflated first;
  - inside each decoded stream, BT..ET blocks are tokenized: `(..)` Tj
    appends the string, `[..] TJ` appends the array's string elements in
    order (kern numbers ignored), Td/TD/T* and ET append one '\n' iff
    text was already emitted and doesn't end with '\n';
  - literal-string escapes per PDF 7.3.4.2: \n \r \t \b \f, \( \) \\,
    \ooo octal (1-3 digits), backslash-EOL line continuation, unknown
    escape drops the backslash; raw EOL inside a string becomes '\n';
    balanced unescaped parens nest;
  - anything malformed (bad Length, truncated stream, failed inflate,
    unbalanced BT/ET, unterminated string) voids the WHOLE file -> null.
"""
import csv, hashlib, os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "pdf")

# ---------------------------------------------------------------- builder

def build_pdf(objects):
    """objects: list of bytes bodies; returns full PDF with xref."""
    out = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets = []
    for i, body in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()
    return out


def stream_obj(data, extra_dict=b"", flate=False):
    if flate:
        data = zlib.compress(data)
        extra_dict += b" /Filter /FlateDecode"
    return (b"<< /Length " + str(len(data)).encode() + extra_dict
            + b" >>\nstream\n" + data + b"\nendstream")


def image_obj(w, h):
    # raw grayscale bytes; content is opaque to the extractor
    data = bytes((x * 37 + 11) % 256 for x in range(w * h))
    return stream_obj(
        data, b" /Type /XObject /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /ColorSpace /DeviceGray /BitsPerComponent 8")


FONT = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"


def doc(contents, extra_objects=()):
    """One-page doc whose /Contents is the (list of) content stream objs.

    Object layout: 1 catalog, 2 pages, 3 page, 4.. content streams,
    then extra objects (images), last font."""
    n_contents = len(contents)
    first = 4
    refs = b" ".join(f"{first + i} 0 R".encode() for i in range(n_contents))
    contents_ref = refs if n_contents == 1 else b"[" + refs + b"]"
    font_num = first + n_contents + len(extra_objects)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
        + contents_ref + b" /Resources << /Font << /F1 "
        + str(font_num).encode() + b" 0 R >> >> >>",
    ] + list(contents) + list(extra_objects) + [FONT]
    return build_pdf(objects)


# ---------------------------------------------- fixtures (declared intent)

C_PLAIN = b"""% page one content (comment must be skipped)
BT
/F1 12 Tf
72 720 Td
(This first line is deliberately longer than forty characters.) Tj
0 -14 Td
(Second line follows a Td line move.) Tj
T*
(Third line follows a T* line move.) Tj
ET
BT
/F1 10 Tf
72 600 Td
(A second text object on the same page.) Tj
ET"""
T_PLAIN = ("This first line is deliberately longer than forty characters.\n"
           "Second line follows a Td line move.\n"
           "Third line follows a T* line move.\n"
           "A second text object on the same page.\n")

C_FLATE = rb"""BT
/F1 12 Tf
72 720 Td
[(Kerned fragments of one long line join se) -120 (amlessly, ) 30 (numbers ignored.)] TJ
2 -14 TD
(Escapes: \(parens\), back\\slash, octal \101\102\103, tab\there.) Tj
ET"""
T_FLATE = ("Kerned fragments of one long line join seamlessly, "
           "numbers ignored.\n"
           "Escapes: (parens), back\\slash, octal ABC, tab\there.\n")

C_MULTI_1 = rb"""BT
72 720 Td
(Stream one is FlateDecode-compressed and carries this line.) Tj
ET"""
T_MULTI_1 = "Stream one is FlateDecode-compressed and carries this line.\n"
C_MULTI_2 = rb"""BT
72 700 Td
(Stream two is stored uncompressed after an image XObject.) Tj
ET"""
T_MULTI_2 = "Stream two is stored uncompressed after an image XObject.\n"

# raw newline inside a literal string -> '\n'; backslash-EOL continuation
# -> nothing; nested unescaped parens; unknown escape \q -> 'q'
C_ESC = (b"BT\n72 720 Td\n"
         b"(Continuation joins this fragment with th\\\nat one; "
         b"(nested (parens)) survive; \\q drops the backslash.) Tj\n"
         b"0 -14 Td\n"
         b"(A raw\nnewline and a raw\r\ncrlf both normalize.) Tj\n"
         b"ET")
T_ESC = ("Continuation joins this fragment with that one; "
         "(nested (parens)) survive; q drops the backslash.\n"
         "A raw\nnewline and a raw\ncrlf both normalize.\n")

FIXTURES = [
    # name, pdf bytes, expected_text, n_streams, n_text_blocks
    ("doc_plain.pdf", doc([stream_obj(C_PLAIN)]), T_PLAIN, 1, 2),
    ("doc_flate.pdf", doc([stream_obj(C_FLATE, flate=True)]), T_FLATE, 1, 1),
    ("doc_multi.pdf",
     doc([stream_obj(C_MULTI_1, flate=True), stream_obj(C_MULTI_2)],
         extra_objects=[image_obj(6, 4)]),
     T_MULTI_1 + T_MULTI_2, 3, 2),
    ("doc_imgonly.pdf", doc([], extra_objects=[image_obj(8, 8)]), "", 1, 0),
    ("doc_escapes.pdf", doc([stream_obj(C_ESC)]), T_ESC, 1, 1),
]

# truncated mid-stream-DATA: /Length overruns the buffer -> whole-file
# null (cut 20 bytes into the compressed payload, so the dict parses
# fine and the overrun check itself is what fires)
_FULL = doc([stream_obj(C_FLATE, flate=True)])
BROKEN = _FULL[:_FULL.find(b"stream\n") + 7 + 20]
assert _FULL.find(b"stream\n") > 0


# ------------------------------------- independent extractor (the gate)

WS = b"\x00\t\n\x0c\r "
DELIM = b"()<>[]{}/%"


def _parse_string(d, i):
    """i at '('; returns (text, next_i). Mirrors PDF 7.3.4.2."""
    assert d[i:i + 1] == b"("
    i += 1
    depth, out = 1, []
    while depth > 0:
        if i >= len(d):
            raise ValueError("unterminated string")
        c = d[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(d):
                raise ValueError("trailing backslash")
            e = d[i]
            if e in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                            0x62: "\b", 0x66: "\f"}[e])
                i += 1
            elif e in b"()\\":
                out.append(chr(e)); i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                v, k = 0, 0
                while k < 3 and i < len(d) and 0x30 <= d[i] <= 0x37:
                    v = v * 8 + (d[i] - 0x30); i += 1; k += 1
                out.append(chr(v & 0xFF))
            elif e == 0x0D:  # continuation
                i += 1
                if i < len(d) and d[i] == 0x0A:
                    i += 1
            elif e == 0x0A:
                i += 1
            else:
                out.append(chr(e)); i += 1
        elif c == 0x28:
            depth += 1; out.append("("); i += 1
        elif c == 0x29:
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        elif c == 0x0D:
            out.append("\n"); i += 1
            if i < len(d) and d[i] == 0x0A:
                i += 1
        else:
            out.append(chr(c)); i += 1
    return "".join(out), i


def _scan_content(d, sb):
    """Tokenize one decoded content stream, appending into sb (a list of
    chars); returns number of BT blocks. Raises on malformed."""
    i, blocks, in_text = 0, 0, False
    last_str, arr, in_array = None, [], False

    def nl():
        if sb and sb[-1] != "\n":
            sb.append("\n")

    while i < len(d):
        c = d[i]
        if c in WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < len(d) and d[i] not in b"\r\n":
                i += 1
        elif c == 0x28:
            s, i = _parse_string(d, i)
            if in_array:
                arr.append(s)
            else:
                last_str = s
        elif c == 0x5B:  # [
            in_array, arr = True, []
            i += 1
        elif c == 0x5D:  # ]
            in_array = False
            i += 1
        elif c == 0x2F:  # /name
            i += 1
            while i < len(d) and d[i] not in WS and d[i] not in DELIM:
                i += 1
        elif c in b"+-.0123456789":
            i += 1
            while i < len(d) and d[i] in b"+-.0123456789":
                i += 1
        elif c == 0x3C:  # hex string or inline dict: skip opaquely
            if d[i:i + 2] == b"<<":
                depth, i = 1, i + 2
                while depth > 0:
                    if i >= len(d) - 1:
                        raise ValueError("unterminated dict")
                    if d[i:i + 2] == b"<<":
                        depth += 1; i += 2
                    elif d[i:i + 2] == b">>":
                        depth -= 1; i += 2
                    else:
                        i += 1
            else:
                j = d.find(b">", i)
                if j < 0:
                    raise ValueError("unterminated hex string")
                i = j + 1
        else:  # operator token
            j = i
            while j < len(d) and (0x41 <= d[j] <= 0x5A or 0x61 <= d[j] <= 0x7A
                                  or d[j] in b"*'\""):
                j += 1
            if j == i:
                raise ValueError(f"bad byte {c} at {i}")
            op = d[i:j].decode("latin-1")
            i = j
            if op == "BT":
                if in_text:
                    raise ValueError("nested BT")
                in_text = True
                blocks += 1
            elif op == "ET":
                if not in_text:
                    raise ValueError("ET outside BT")
                nl()
                in_text = False
            elif op in ("Td", "TD", "T*") and in_text:
                nl()
            elif op == "Tj" and in_text and last_str is not None:
                sb.append(last_str)
            elif op == "TJ" and in_text:
                sb.append("".join(arr))
            last_str, arr, in_array = None, [], False
    if in_text:
        raise ValueError("unterminated BT")
    return blocks


def extract(b):
    """The whole-file walk: returns (n_streams, n_blocks, text) or None
    for a malformed file — the contract PdfText.scala mirrors."""
    if len(b) < 8 or b[:5] != b"%PDF-":
        return None
    i, n = 0, len(b)
    n_streams, n_blocks, sb = 0, 0, []
    try:
        while i < n - 1:
            if b[i:i + 2] != b"<<":
                i += 1
                continue
            start, depth, j = i, 0, i
            end = -1
            while end < 0:
                if j >= n - 1:
                    raise ValueError("unterminated dict")
                if b[j:j + 2] == b"<<":
                    depth += 1; j += 2
                elif b[j:j + 2] == b">>":
                    depth -= 1; j += 2
                    if depth == 0:
                        end = j
                else:
                    j += 1
            k = end
            while k < n and b[k] in WS:
                k += 1
            if b[k:k + 6] != b"stream":
                i = end
                continue
            d = b[start:end]
            k += 6
            if b[k:k + 1] == b"\r":
                k += 1
            if b[k:k + 1] != b"\n":
                raise ValueError("no EOL after stream")
            k += 1
            # direct integer /Length only
            li = d.find(b"/Length")
            if li < 0:
                raise ValueError("no /Length")
            li += 7
            while li < len(d) and d[li] in WS:
                li += 1
            ln = 0
            got = False
            while li < len(d) and 0x30 <= d[li] <= 0x39:
                ln = ln * 10 + (d[li] - 0x30); li += 1; got = True
            if not got:
                raise ValueError("bad /Length")
            while li < len(d) and d[li] in WS:
                li += 1
            if 0x30 <= (d[li] if li < len(d) else 0) <= 0x39:
                raise ValueError("indirect /Length out of scope")
            if k + ln > n:
                raise ValueError("stream overruns file")
            data = b[k:k + ln]
            k += ln
            if b[k:k + 1] == b"\r":
                k += 1
            if b[k:k + 1] == b"\n":
                k += 1
            if b[k:k + 9] != b"endstream":
                raise ValueError("no endstream where /Length ends")
            i = k + 9
            n_streams += 1
            if b"/Image" in d:
                continue
            if b"/FlateDecode" in d:
                data = zlib.decompress(data)
            n_blocks += _scan_content(data, sb)
    except (ValueError, zlib.error):
        return None
    return n_streams, n_blocks, "".join(sb)


# ----------------------------------------------------------------- main

def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for name, data, expected, exp_streams, exp_blocks in FIXTURES:
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        got = extract(data)
        assert got is not None, f"{name}: independent extractor rejected"
        g_streams, g_blocks, g_text = got
        assert g_text == expected, (
            f"{name}: independent extraction diverged from declared text:\n"
            f"  got      {g_text!r}\n  expected {expected!r}")
        assert g_streams == exp_streams, (name, g_streams, exp_streams)
        assert g_blocks == exp_blocks, (name, g_blocks, exp_blocks)
        head40 = expected[:40]
        assert "\n" not in head40 or expected == "", \
            f"{name}: keep head40 newline-free (CSV simplicity)"
        rows.append({
            "name": name, "n_streams": g_streams,
            "n_text_blocks": g_blocks, "n_chars": len(expected),
            "text_md5": hashlib.md5(expected.encode()).hexdigest(),
            "head40": head40,
        })
        print(f"{name}: {len(data)} bytes, {g_streams} streams, "
              f"{g_blocks} blocks, {len(expected)} chars OK")
    # the malformed fixture must be REJECTED by the independent parser
    with open(os.path.join(OUT, "doc_broken.pdf"), "wb") as f:
        f.write(BROKEN)
    assert extract(BROKEN) is None, "doc_broken.pdf must be malformed"
    print(f"doc_broken.pdf: {len(BROKEN)} bytes, rejected as planted")

    with open(os.path.join(OUT, "manifest.csv"), "w", newline="") as mf:
        w = csv.DictWriter(mf, fieldnames=[
            "name", "n_streams", "n_text_blocks", "n_chars", "text_md5",
            "head40"])
        w.writeheader()
        w.writerows(rows)
    print("manifest.csv:", len(rows), "rows")


if __name__ == "__main__":
    main()
