package graft.functions

import graft.SparkSpec

/** Archive decoders (q283–q286) — pinned beyond the manifest oracle:
  * malformed-to-null contracts on adversarial bytes, the zip
  * structural-vs-data damage split, and the Common Crawl wire identity
  * (JDK's own multi-member GZIPInputStream — an INDEPENDENT inflate
  * path — must reproduce crawl.warc from crawl.warc.gz byte-for-byte,
  * tying q286's members to q285's records). */
class ArchiveSpec extends SparkSpec {

  private def readBytes(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("tar: docs.tar walks to 5 checksum-valid members; broken.tar voids") {
    val dir = graft.Fixtures.path("tar")
    val ok = ArchiveBytes.tarEntries(readBytes(s"$dir/docs.tar"))
    assert(ok != null && ok.numElements() == 5)
    // multi-block member present (size > 512) and dir entry typed '5'
    val sizes = (0 until 5).map(i => ok.getStruct(i, 5).getLong(1))
    assert(sizes.exists(_ > 1024))
    assert(ok.getStruct(0, 5).getUTF8String(2).toString == "5")
    assert(ArchiveBytes.tarEntries(readBytes(s"$dir/broken.tar")) == null,
      "a flipped checksum digit must void the whole archive")
  }

  test("tar: payload tampering is md5-visible, header tampering voids") {
    val raw = readBytes(graft.Fixtures.path("tar") + "/docs.tar")
    val before = ArchiveBytes.tarEntries(raw)
    // flip one payload byte of member 2 (header checksum does not cover
    // payloads — the damage must surface through payload_md5 instead)
    val t1 = raw.clone()
    val off = before.getStruct(1, 5).getLong(3).toInt + 512
    t1(off) = (t1(off) ^ 0x01).toByte
    val after = ArchiveBytes.tarEntries(t1)
    assert(after != null)
    assert(after.getStruct(1, 5).getUTF8String(4) !=
      before.getStruct(1, 5).getUTF8String(4))
    // flip one NAME byte instead: checksum now disagrees -> null
    val t2 = raw.clone()
    t2(before.getStruct(1, 5).getLong(3).toInt) =
      (t2(before.getStruct(1, 5).getLong(3).toInt) ^ 0x01).toByte
    assert(ArchiveBytes.tarEntries(t2) == null)
  }

  test("zip: corrupt.zip = one crc_ok=false row; structural damage voids") {
    val dir = graft.Fixtures.path("zip")
    val ok = ArchiveBytes.zipEntries(readBytes(s"$dir/bundle.zip"))
    assert(ok != null && ok.numElements() == 5)
    assert((0 until 5).forall(i => ok.getStruct(i, 7).getBoolean(5)))
    val bad = ArchiveBytes.zipEntries(readBytes(s"$dir/corrupt.zip"))
    assert(bad != null && bad.numElements() == 5)
    assert(!bad.getStruct(0, 7).getBoolean(5),
      "the flipped stored byte must surface as crc_ok=false")
    assert((1 until 5).forall(i => bad.getStruct(i, 7).getBoolean(5)))
    // structural: truncate the EOCD record -> null, never partial rows
    val raw = readBytes(s"$dir/bundle.zip")
    assert(ArchiveBytes.zipEntries(raw.take(raw.length - 10)) == null)
  }

  test("warc.gz: JDK multi-member inflate reproduces crawl.warc exactly") {
    val dir = graft.Fixtures.path("warc")
    val warc = readBytes(s"$dir/crawl.warc")
    val gz = readBytes(s"$dir/crawl.warc.gz")
    // independent inflate path: java.util.zip.GZIPInputStream handles
    // member concatenation natively
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    assert(md5hex(out.toByteArray) == md5hex(warc),
      "concatenated inflated members must BE the plain warc")
    // and the two decoders agree on the record/member count
    val members = ArchiveBytes.gzipMembers(gz)
    val records = ArchiveBytes.warcRecords(warc)
    assert(members != null && records != null)
    assert(members.numElements() == records.numElements())
    // every member's usize is its record's byte length: offsets of the
    // members partition the warc exactly
    val total = (0 until members.numElements())
      .map(i => members.getStruct(i, 5).getLong(3)).sum
    assert(total == warc.length.toLong)
  }

  test("warc: malformed bytes void (truncated payload, lying length)") {
    val warc = readBytes(graft.Fixtures.path("warc") + "/crawl.warc")
    assert(ArchiveBytes.warcRecords(warc) != null)
    assert(ArchiveBytes.warcRecords(warc.take(warc.length - 3)) == null,
      "truncated record separator must void")
    // corrupt a Content-Length digit: payload framing now lies
    val s = new String(warc, java.nio.charset.StandardCharsets.ISO_8859_1)
    val i = s.indexOf("Content-Length: ")
    val t = warc.clone()
    t(i + 16) = '9'.toByte
    assert(ArchiveBytes.warcRecords(t) == null)
    // and a gzip trailer lie voids the gz side
    val gz = readBytes(graft.Fixtures.path("warc") + "/crawl.warc.gz")
    val g = gz.clone()
    g(g.length - 1) = (g(g.length - 1) ^ 0x01).toByte // last ISIZE byte
    assert(ArchiveBytes.gzipMembers(g) == null)
  }
}
