#!/usr/bin/env python3
"""Generate archive-container fixtures (round 11: q283 tar, q284 zip,
q285 warc, q286 warc.gz).

Discipline (the gen_pdf_fixtures.py pattern): every container is BUILT
with a stdlib writer (tarfile / zipfile / zlib), then RE-WALKED by an
independent struct-level parser implemented in this file, and the
manifests record what the INDEPENDENT walker saw — so the builder, this
walker, and the Scala decoders (graft.functions.ArchiveFunctions) must
all agree byte-for-byte. Planted structure is assert-checked so the
fixtures cannot drift silently.

warc.gz follows the Common Crawl convention: one gzip member PER WARC
record; the generator asserts that the concatenation of all inflated
members reproduces crawl.warc exactly.
"""
import csv
import hashlib
import io
import os
import re
import struct
import tarfile
import zipfile
import zlib

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'fixtures')


def md5(b):
    return hashlib.md5(b).hexdigest()


# ---------------------------------------------------------------- tar ----

def walk_tar(b, fname, expect_fail=False):
    """Independent ustar walker — mirrors the Scala TarWalk contract:
    512-byte blocks, checksum validated (chksum field counted as
    spaces), octal fields strictly [0-7], prefix field joined, stop at
    the first all-zero block; any violation voids the whole file."""
    rows = []
    pos = 0

    def octal(fld):
        s = fld.split(b'\0')[0].strip(b' ')
        if not s:
            return 0
        if not all(0x30 <= c <= 0x37 for c in s):
            raise ValueError('bad octal')
        return int(s, 8)

    try:
        while pos + 512 <= len(b):
            hdr = b[pos:pos + 512]
            if hdr == b'\0' * 512:
                break
            if hdr[257:262] != b'ustar':
                raise ValueError('bad magic')
            stored = octal(hdr[148:156])
            calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
            if stored != calc:
                raise ValueError('bad checksum')
            name = hdr[0:100].split(b'\0')[0].decode('ascii')
            prefix = hdr[345:500].split(b'\0')[0].decode('ascii')
            if prefix:
                name = prefix + '/' + name
            size = octal(hdr[124:136])
            tfl = chr(hdr[156]) if hdr[156] != 0 else '0'
            data = b[pos + 512:pos + 512 + size]
            if len(data) != size:
                raise ValueError('payload overrun')
            rows.append(dict(file=fname, name=name, size=size, typeflag=tfl,
                             offset=pos, payload_md5=md5(data)))
            pos += 512 + ((size + 511) // 512) * 512
    except ValueError:
        assert expect_fail, f'unexpected malformed {fname}'
        return None
    assert not expect_fail, f'{fname} expected to fail but parsed'
    return rows


def build_tar():
    d = os.path.join(ROOT, 'tar')
    os.makedirs(d, exist_ok=True)
    members = [
        ('docs/', b'', '5'),
        ('docs/a.txt', (b'alpha line of fixture text\n' * 9) + b'tail', '0'),
        ('docs/b.txt',
         b'The quick brown fox jumps over the lazy dog. ' * 27, '0'),
        ('notes/empty.txt', b'', '0'),
        ('notes/c.md', b'# heading\n' + b'body text line\n' * 46, '0'),
    ]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode='w',
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, data, tfl in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 1600000000
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ''
            if tfl == '5':
                ti.type = tarfile.DIRTYPE
                tf.addfile(ti)
            else:
                tf.addfile(ti, io.BytesIO(data))
    raw = buf.getvalue()
    with open(os.path.join(d, 'docs.tar'), 'wb') as f:
        f.write(raw)

    rows = walk_tar(raw, 'docs.tar')
    assert len(rows) == len(members)
    # cross-check the independent walk against tarfile's own listing
    with tarfile.open(os.path.join(d, 'docs.tar')) as tf:
        names = [m.name + ('/' if m.isdir() else '') for m in tf.getmembers()]
    assert [r['name'] for r in rows] == names, (names, rows)
    assert [r['size'] for r in rows] == [len(m[1]) for m in members]
    assert [r['payload_md5'] for r in rows] == [md5(m[1]) for m in members]
    assert rows[0]['typeflag'] == '5' and rows[1]['typeflag'] == '0'
    # multi-block member really spans blocks
    assert rows[2]['size'] > 1024

    # broken.tar: corrupt the SECOND header's checksum digit — the
    # decoder must void the whole file, never emit the leading entry
    off2 = rows[1]['offset']
    bb = bytearray(raw)
    bb[off2 + 148] = ord('7') if bb[off2 + 148] != ord('7') else ord('3')
    with open(os.path.join(d, 'broken.tar'), 'wb') as f:
        f.write(bytes(bb))
    assert walk_tar(bytes(bb), 'broken.tar', expect_fail=True) is None

    with open(os.path.join(d, 'manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(
            f, ['file', 'name', 'size', 'typeflag', 'offset', 'payload_md5'])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f'tar: {len(rows)} members, {len(raw)} bytes')


# ---------------------------------------------------------------- zip ----

def walk_zip(b, fname):
    """Independent EOCD → central directory → local header walker
    (mirrors the Scala ZipWalk contract): entries in central-directory
    order, stored/deflated payloads decoded, CRC32 + usize verified →
    crc_ok, payload hashed as decoded."""
    eocd = b.rfind(b'PK\x05\x06')
    assert eocd >= 0
    n, = struct.unpack('<H', b[eocd + 10:eocd + 12])
    cdoff, = struct.unpack('<I', b[eocd + 16:eocd + 20])
    rows = []
    pos = cdoff
    for i in range(n):
        assert b[pos:pos + 4] == b'PK\x01\x02'
        method, = struct.unpack('<H', b[pos + 10:pos + 12])
        crc, csize, usize = struct.unpack('<III', b[pos + 16:pos + 28])
        nlen, xlen, clen = struct.unpack('<HHH', b[pos + 28:pos + 34])
        lho, = struct.unpack('<I', b[pos + 42:pos + 46])
        name = b[pos + 46:pos + 46 + nlen].decode('ascii')
        assert b[lho:lho + 4] == b'PK\x03\x04'
        lnlen, lxlen = struct.unpack('<HH', b[lho + 26:lho + 30])
        dstart = lho + 30 + lnlen + lxlen
        data = b[dstart:dstart + csize]
        assert len(data) == csize
        raw = data if method == 0 else zlib.decompress(data, -15)
        ok = (zlib.crc32(raw) & 0xffffffff) == crc and len(raw) == usize
        rows.append(dict(file=fname, idx=i, name=name, method=method,
                         csize=csize, usize=usize,
                         crc_ok='true' if ok else 'false',
                         payload_md5=md5(raw)))
        pos += 46 + nlen + xlen + clen
    return rows


def build_zip():
    d = os.path.join(ROOT, 'zip')
    os.makedirs(d, exist_ok=True)
    entries = [
        ('readme.txt',
         b'archive fixture readme: stored entry, no compression\n',
         zipfile.ZIP_STORED),
        ('data/big.txt',
         b'0123456789 compressible payload line repeated many times\n' * 140,
         zipfile.ZIP_DEFLATED),
        ('data/mixed.bin', bytes(range(33, 127)) * 40, zipfile.ZIP_DEFLATED),
        ('empty.txt', b'', zipfile.ZIP_STORED),
        ('deep/nested/path/leaf.txt', b'leaf content at a nested path\n',
         zipfile.ZIP_DEFLATED),
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w') as zf:
        for name, data, method in entries:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zi.external_attr = 0o600 << 16
            zf.writestr(zi, data)
    raw = buf.getvalue()
    with open(os.path.join(d, 'bundle.zip'), 'wb') as f:
        f.write(raw)
    rows = walk_zip(raw, 'bundle.zip')
    assert len(rows) == len(entries)
    assert all(r['crc_ok'] == 'true' for r in rows)
    assert [r['name'] for r in rows] == [e[0] for e in entries]
    assert [r['payload_md5'] for r in rows] == [md5(e[1]) for e in entries]
    # deflate actually compressed the repetitive member
    assert rows[1]['csize'] < rows[1]['usize']

    # corrupt.zip: flip one byte inside the STORED readme payload —
    # structure stays valid, the CRC catches it ⇒ a crc_ok=false ROW
    # (data damage is per-entry visible, unlike structural damage which
    # voids the file)
    assert raw[0:4] == b'PK\x03\x04'
    nlen, xlen = struct.unpack('<HH', raw[26:30])
    p0 = 30 + nlen + xlen
    bb = bytearray(raw)
    bb[p0] ^= 0x20
    with open(os.path.join(d, 'corrupt.zip'), 'wb') as f:
        f.write(bytes(bb))
    crows = walk_zip(bytes(bb), 'corrupt.zip')
    assert crows[0]['crc_ok'] == 'false'
    assert all(r['crc_ok'] == 'true' for r in crows[1:])
    # the corrupted payload hashes differently from the pristine one
    assert crows[0]['payload_md5'] != rows[0]['payload_md5']

    with open(os.path.join(d, 'manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(f, ['file', 'idx', 'name', 'method', 'csize',
                               'usize', 'crc_ok', 'payload_md5'])
        w.writeheader()
        for r in rows + crows:
            w.writerow(r)
    print(f'zip: {len(rows)} entries, {len(raw)} bytes')


# --------------------------------------------------------------- warc ----

def clean_html(html):
    """Python mimic of TextAnalysis.htmlCleanOf / htmlCleanSql — SAME
    patterns, SAME order (entities with &amp; LAST). Used only to
    compute manifest ground truth; asserted below to invert the
    builder's encoding exactly."""
    t = re.sub(r'(?s)<script[^>]*>.*?</script>', ' ', html)
    t = re.sub(r'(?s)<style[^>]*>.*?</style>', ' ', t)
    t = re.sub(r'<[^>]+>', ' ', t)
    for a, b in [('&lt;', '<'), ('&gt;', '>'), ('&quot;', '"'),
                 ('&#39;', "'"), ('&amp;', '&')]:
        t = t.replace(a, b)
    return re.sub(r'\s+', ' ', t).strip()


def enc(text):
    """HTML-encode planted text (the builder side; & first)."""
    return (text.replace('&', '&amp;').replace('<', '&lt;')
            .replace('>', '&gt;').replace('"', '&quot;')
            .replace("'", '&#39;'))


def warc_record(rtype, headers, payload):
    h = ('WARC/1.0\r\n'
         f'WARC-Type: {rtype}\r\n'
         + ''.join(f'{k}: {v}\r\n' for k, v in headers)
         + f'Content-Length: {len(payload)}\r\n\r\n')
    return h.encode('ascii') + payload + b'\r\n\r\n'


def http_response(status, reason, ctype, body):
    return (f'HTTP/1.1 {status} {reason}\r\nContent-Type: {ctype}\r\n\r\n'
            .encode('ascii') + body)


def walk_warc(b, fname):
    """Independent WARC/1.0 record walker — mirrors the Scala WarcWalk
    contract: version line, headers to CRLFCRLF, Content-Length payload
    bytes, two CRLF record separator; responses additionally split the
    HTTP status line and body."""
    rows = []
    pos = 0
    seq = 0
    while pos < len(b):
        assert b[pos:pos + 10] == b'WARC/1.0\r\n', b[pos:pos + 12]
        he = b.index(b'\r\n\r\n', pos)
        hdrs = {}
        for line in b[pos:he].decode('ascii').split('\r\n')[1:]:
            k, v = line.split(': ', 1)
            hdrs[k] = v
        cl = int(hdrs['Content-Length'])
        payload = b[he + 4:he + 4 + cl]
        assert len(payload) == cl
        assert b[he + 4 + cl:he + 4 + cl + 4] == b'\r\n\r\n'
        seq += 1
        rtype = hdrs['WARC-Type']
        uri = hdrs.get('WARC-Target-URI', '')
        status, cmd5, chead = -1, '', ''
        if rtype == 'response':
            sl = payload[:payload.index(b'\r\n')].decode('ascii')
            status = int(sl.split(' ')[1])
            body = payload[payload.index(b'\r\n\r\n') + 4:].decode('ascii')
            c = clean_html(body)
            cmd5 = md5(c.encode('utf-8'))
            chead = c[:40]
        rows.append(dict(file=fname, seq=seq, rec_type=rtype, target_uri=uri,
                         content_length=cl, http_status=status,
                         payload_md5=md5(payload), clean_md5=cmd5,
                         clean_head40=chead))
        pos = he + 4 + cl + 4
    return rows


def build_warc():
    d = os.path.join(ROOT, 'warc')
    os.makedirs(d, exist_ok=True)

    pages = [
        ('http://example.org/a', 'Alpha Page',
         ['First paragraph of the alpha page.',
          'Second paragraph mentions cats & dogs.']),
        ('http://example.org/b', 'Bravo "Quoted" Title',
         ['Math claims 1 < 2 and 3 > 2 hold.',
          "It's the entity page."]),
        ('http://example.org/c', 'Charlie Page',
         ['Charlie has nested <tags> in text.',
          'And a final line.']),
    ]
    records = [warc_record(
        'warcinfo', [('WARC-Record-ID', '<urn:fix:info>')],
        b'software: graft-archive-fixture-gen 1.0\r\n')]
    records.append(warc_record(
        'request', [('WARC-Target-URI', pages[0][0])],
        b'GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n'))
    for uri, title, lines in pages:
        planted = ' '.join([title, title] + lines)
        body = ('<html><head><title>' + enc(title) + '</title>'
                '<style>p { color: #333; }</style>'
                '<script type="text/javascript">var x = 1 < 2;</script>'
                '</head><body><h1>' + enc(title) + '</h1>'
                + '<p>' + enc(lines[0]) + '</p>\n  <p>' + enc(lines[1])
                + '</p></body></html>')
        # the cleaning must invert the encoding exactly — planted truth
        assert clean_html(body) == planted, (clean_html(body), planted)
        records.append(warc_record(
            'response', [('WARC-Target-URI', uri)],
            http_response(200, 'OK', 'text/html', body.encode('ascii'))))
    records.append(warc_record(
        'response', [('WARC-Target-URI', 'http://example.org/gone')],
        http_response(404, 'Not Found', 'text/plain',
                      b'That page   is\n long gone.')))

    raw = b''.join(records)
    with open(os.path.join(d, 'crawl.warc'), 'wb') as f:
        f.write(raw)
    rows = walk_warc(raw, 'crawl.warc')
    assert len(rows) == 6
    assert [r['rec_type'] for r in rows] == \
        ['warcinfo', 'request', 'response', 'response', 'response',
         'response']
    assert rows[5]['http_status'] == 404
    assert rows[5]['clean_head40'].startswith('That page is long gone.')
    for r, (uri, title, lines) in zip(rows[2:5], pages):
        assert r['target_uri'] == uri
        assert r['clean_md5'] == md5(
            ' '.join([title, title] + lines).encode('utf-8'))
    with open(os.path.join(d, 'manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(f, ['file', 'seq', 'rec_type', 'target_uri',
                               'content_length', 'http_status',
                               'payload_md5', 'clean_md5', 'clean_head40'])
        w.writeheader()
        for r in rows:
            w.writerow(r)

    # dataset-card ground truth for q300 (wire → training-ready stats):
    # recomputed from the independent walk's records, clean texts from
    # the SAME mimic cleaner the per-record manifest certifies
    # re-derive the clean texts (walk_warc only kept md5/head40)
    cleans = []
    pos = 0
    while pos < len(raw):
        he = raw.index(b'\r\n\r\n', pos)
        hdrs = dict(line.split(': ', 1)
                    for line in raw[pos:he].decode('ascii').split('\r\n')[1:])
        cl = int(hdrs['Content-Length'])
        payload = raw[he + 4:he + 4 + cl]
        if hdrs['WARC-Type'] == 'response':
            body = payload[payload.index(b'\r\n\r\n') + 4:].decode('ascii')
            cleans.append(clean_html(body))
        pos = he + 4 + cl + 4
    all_toks = [t for c in cleans for t in c.split(' ')]
    card = dict(
        n_records=len(rows),
        n_responses=sum(1 for r2 in rows if r2['rec_type'] == 'response'),
        n_ok=sum(1 for r2 in rows if r2['http_status'] == 200),
        content_bytes=sum(r2['content_length'] for r2 in rows),
        clean_chars=sum(len(c) for c in cleans),
        n_tokens=len(all_toks),
        n_distinct=len(set(all_toks)))
    assert card['n_records'] == 6 and card['n_responses'] == 4
    assert card['n_ok'] == 3 and card['n_tokens'] > 30
    with open(os.path.join(d, 'card_manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(f, list(card.keys()))
        w.writeheader()
        w.writerow(card)

    print(f'warc: {len(rows)} records, {len(raw)} bytes')
    return records, raw


def gz_member(data):
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    d = co.compress(data) + co.flush()
    hdr = b'\x1f\x8b\x08\x00' + struct.pack('<I', 0) + b'\x00\x03'
    trl = struct.pack('<II', zlib.crc32(data) & 0xffffffff,
                      len(data) & 0xffffffff)
    return hdr + d + trl


def walk_gz(b, fname):
    """Independent multi-member gzip walker — mirrors the Scala GzipWalk
    contract: header flags honored, raw-deflate body, trailer CRC32 +
    ISIZE verified, members walked to EOF."""
    rows = []
    pos = 0
    seq = 0
    while pos < len(b):
        assert b[pos] == 0x1f and b[pos + 1] == 0x8b and b[pos + 2] == 8
        flg = b[pos + 3]
        p = pos + 10
        if flg & 4:
            xlen, = struct.unpack('<H', b[p:p + 2])
            p += 2 + xlen
        if flg & 8:
            p = b.index(b'\0', p) + 1
        if flg & 16:
            p = b.index(b'\0', p) + 1
        if flg & 2:
            p += 2
        dec = zlib.decompressobj(-15)
        data = dec.decompress(b[p:])
        consumed = len(b) - p - len(dec.unused_data)
        crc, isize = struct.unpack('<II', b[p + consumed:p + consumed + 8])
        assert crc == (zlib.crc32(data) & 0xffffffff)
        assert isize == (len(data) & 0xffffffff)
        end = p + consumed + 8
        seq += 1
        rows.append(dict(file=fname, seq=seq, offset=pos, csize=end - pos,
                         usize=len(data), payload_md5=md5(data)))
        pos = end
    return rows


def build_warc_gz(records, raw):
    d = os.path.join(ROOT, 'warc')
    gz = b''.join(gz_member(r) for r in records)
    with open(os.path.join(d, 'crawl.warc.gz'), 'wb') as f:
        f.write(gz)
    rows = walk_gz(gz, 'crawl.warc.gz')
    assert len(rows) == len(records)
    # the Common Crawl identity: concatenated inflated members == the
    # plain warc, byte for byte
    assert b''.join(records) == raw
    assert [r['payload_md5'] for r in rows] == [md5(r2) for r2 in records]
    with open(os.path.join(d, 'gz_manifest.csv'), 'w', newline='') as f:
        w = csv.DictWriter(
            f, ['file', 'seq', 'offset', 'csize', 'usize', 'payload_md5'])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f'warc.gz: {len(rows)} members, {len(gz)} bytes')


if __name__ == '__main__':
    build_tar()
    build_zip()
    records, raw = build_warc()
    build_warc_gz(records, raw)
    print('OK')
