#!/usr/bin/env python3
"""Generate UTF-8 validation fixtures (round 11, q306).

Each fixture is a byte file with PLANTED encoding structure; the
manifest records what an independent maximal-subpart walker (below)
sees — and every file is CROSS-CHECKED against CPython's own
`bytes.decode('utf-8', errors='replace')` (a third implementation), so
the planted bytes are ones on which the documented policy and the
stdlib agree exactly. The Scala decoder (graft.functions.Utf8Stats)
must match the manifest byte-for-byte.

Replacement policy (WHATWG/CPython maximal subpart): on an invalid
sequence, emit ONE U+FFFD for the maximal prefix that could have begun
a valid sequence (a lone continuation byte or invalid lead consumes one
byte; a lead with k valid continuations but an invalid/missing next
byte consumes the lead plus those continuations).
"""
import csv
import hashlib
import os

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'fixtures', 'utf8')


def md5(b):
    return hashlib.md5(b).hexdigest()


def walk_utf8(b):
    """Independent maximal-subpart decoder: returns (chars, n_bad) where
    chars is the decoded string with U+FFFD replacements."""
    out = []
    bad = 0
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            out.append(chr(c))
            i += 1
            continue
        if 0xC2 <= c <= 0xDF:
            need, lo, hi = 1, 0x80, 0xBF
        elif c == 0xE0:
            need, lo, hi = 2, 0xA0, 0xBF
        elif 0xE1 <= c <= 0xEC or c in (0xEE, 0xEF):
            need, lo, hi = 2, 0x80, 0xBF
        elif c == 0xED:
            need, lo, hi = 2, 0x80, 0x9F
        elif c == 0xF0:
            need, lo, hi = 3, 0x90, 0xBF
        elif 0xF1 <= c <= 0xF3:
            need, lo, hi = 3, 0x80, 0xBF
        elif c == 0xF4:
            need, lo, hi = 3, 0x80, 0x8F
        else:  # invalid lead (0x80-0xC1, 0xF5-0xFF)
            out.append('�')
            bad += 1
            i += 1
            continue
        # first continuation has a lead-specific range; the rest 80-BF
        j = i + 1
        k = 0
        while k < need and j < n:
            rlo, rhi = (lo, hi) if k == 0 else (0x80, 0xBF)
            if rlo <= b[j] <= rhi:
                j += 1
                k += 1
            else:
                break
        if k == need:
            cp = 0
            if need == 1:
                cp = ((c & 0x1F) << 6) | (b[i + 1] & 0x3F)
            elif need == 2:
                cp = ((c & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | \
                    (b[i + 2] & 0x3F)
            else:
                cp = ((c & 0x07) << 18) | ((b[i + 1] & 0x3F) << 12) | \
                    ((b[i + 2] & 0x3F) << 6) | (b[i + 3] & 0x3F)
            out.append(chr(cp))
            i = j
        else:
            out.append('�')
            bad += 1
            i = j  # lead + the valid continuations seen (maximal subpart)
    return ''.join(out), bad


def build():
    os.makedirs(ROOT, exist_ok=True)
    files = [
        ('ascii.bin', b'plain ascii text, nothing to repair\n' * 4),
        ('two_byte.bin', 'café naïve résumé '
         .encode('utf-8') * 3),
        ('three_byte.bin', 'price €99 中文 text '
         .encode('utf-8') * 3),
        ('four_byte.bin', 'emoji \U0001F600 and \U0001F680 here '
         .encode('utf-8') * 2),
        # lone continuation bytes + an invalid lead mid-text
        ('stray.bin', b'good \x80 bad \xbf worse \xfe end'),
        # latin-1 bytes read as utf-8: lone leads without continuations
        ('latin1.bin', b'caf\xe9 r\xe9sum\xe9\n'),
        # truncated 3-byte sequence at EOF (lead + one continuation)
        ('truncated.bin', b'euro sign \xe2\x82'),
    ]
    rows = []
    for name, data in files:
        with open(os.path.join(ROOT, name), 'wb') as f:
            f.write(data)
        chars, bad = walk_utf8(data)
        # the stdlib cross-check: CPython's replace policy must agree
        assert chars == data.decode('utf-8', errors='replace'), name
        rows.append(dict(name=name, n_bytes=len(data), n_chars=len(chars),
                         n_bad=bad, text_md5=md5(chars.encode('utf-8'))))
    # planted structure asserts
    by = {r['name']: r for r in rows}
    assert by['ascii.bin']['n_bad'] == 0
    assert by['ascii.bin']['n_chars'] == by['ascii.bin']['n_bytes']
    assert by['two_byte.bin']['n_bad'] == 0
    assert by['two_byte.bin']['n_chars'] < by['two_byte.bin']['n_bytes']
    assert by['stray.bin']['n_bad'] == 3
    assert by['latin1.bin']['n_bad'] == 3
    assert by['truncated.bin']['n_bad'] == 1
    assert by['truncated.bin']['n_chars'] == len('euro sign ') + 1
    with open(os.path.join(ROOT, 'manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(f, ['name', 'n_bytes', 'n_chars', 'n_bad',
                               'text_md5'])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f'utf8: {len(rows)} fixtures')


if __name__ == '__main__':
    build()
    print('OK')
