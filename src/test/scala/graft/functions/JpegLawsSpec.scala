package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Random segment-level JPEG law for the q315 decoder: an INDEPENDENT
  * builder below assembles spec-valid files from random parameters and
  * declares what it built (dimensions, table counts, payload CRCs, scan
  * statistics) from its OWN bookkeeping — never by walking the bytes —
  * so [[JpegInfo.decode]] is checked against construction intent, the
  * same three-way discipline as the committed fixtures (builder ↔
  * Python walker ↔ Scala decoder). Corruption laws: ANY strict prefix,
  * ANY trailing bytes, and a flipped SOS marker must void the file to
  * null — the one-file DROPMALFORMED blast radius q283 established for
  * wire formats. */
object JpegLawsSpec extends Properties("JpegInfo") {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload

  private final case class Built(bytes: Array[Byte], width: Long,
      height: Long, precision: Long, nComp: Long, progressive: Boolean,
      nSegments: Long, nDqt: Long, dqtCrc: Long, nDht: Long, dhtCrc: Long,
      jfif: Boolean, exif: Boolean, nScans: Long, scanBytes: Long,
      nRst: Long)

  private val builtGen: Gen[Built] = for {
    w <- Gen.choose(1, 65535)
    h <- Gen.choose(1, 65535)
    nc <- Gen.choose(1, 4)
    prog <- Gen.oneOf(true, false)
    withJfif <- Gen.oneOf(true, false)
    withExif <- Gen.oneOf(true, false)
    nDqtSegs <- Gen.choose(1, 3)
    dqtEntries <- Gen.listOfN(nDqtSegs, Gen.listOfN(1, Gen.zip(
      Gen.choose(0, 1), Gen.choose(0, 3), Gen.choose(0, 250))).flatMap(e =>
      Gen.choose(1, 2).flatMap(k =>
        Gen.listOfN(k, Gen.zip(Gen.choose(0, 1), Gen.choose(0, 3),
          Gen.choose(0, 250))))))
    nDhtEntries <- Gen.choose(1, 3)
    dhtEntries <- Gen.listOfN(nDhtEntries, Gen.zip(
      Gen.choose(0, 1), Gen.choose(0, 3), Gen.choose(1, 30)))
    scanLen <- Gen.choose(0, 600)
    seed <- Gen.choose(0, 255)
    extraScan <- Gen.oneOf(true, false)
  } yield {
    val dqtCrc = new java.util.zip.CRC32
    val dhtCrc = new java.util.zip.CRC32
    var nSegments = 1L // SOI
    var nDqt = 0L
    var nDht = 0L
    val out = new java.io.ByteArrayOutputStream
    out.write(Array(0xFF.toByte, 0xD8.toByte), 0, 2)
    if (withJfif) {
      val a = seg(0xE0, "JFIF\u0000".getBytes("ISO-8859-1") ++
        Array[Byte](1, 2, 0) ++ be16(72) ++ be16(72) ++ Array[Byte](0, 0))
      out.write(a, 0, a.length)
      nSegments += 1
    }
    if (withExif) {
      val p = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++
        "II*\u0000".getBytes("ISO-8859-1")
      out.write(seg(0xE1, p), 0, p.length + 4)
      nSegments += 1
    }
    dqtEntries.foreach { entries =>
      val payload = entries.flatMap { case (pq, tq, s) =>
        ((pq << 4) | tq).toByte +:
          (0 until 64 * (pq + 1)).map(k => ((s * 7 + k * 13) % 255 + 1).toByte)
      }.toArray
      out.write(seg(0xDB, payload), 0, payload.length + 4)
      dqtCrc.update(payload)
      nDqt += entries.size
      nSegments += 1
    }
    val sofP = Array(8.toByte) ++ be16(h) ++ be16(w) ++ Array(nc.toByte) ++
      (0 until nc).flatMap(c =>
        Seq((c + 1).toByte, 0x11.toByte, (c % 2).toByte))
    out.write(seg(if (prog) 0xC2 else 0xC0, sofP), 0, sofP.length + 4)
    nSegments += 1
    val dhtPayload = dhtEntries.flatMap { case (tc, th, nsyms) =>
      val counts = Array.fill[Byte](16)(0)
      counts(7) = nsyms.toByte
      ((tc << 4) | th).toByte +: (counts ++
        (0 until nsyms).map(k => ((th * 11 + k * 3) % 251).toByte))
    }.toArray
    out.write(seg(0xC4, dhtPayload), 0, dhtPayload.length + 4)
    dhtCrc.update(dhtPayload)
    nDht += dhtEntries.size
    nSegments += 1
    def sosHeader(): Array[Byte] = {
      val p = Array(nc.toByte) ++
        (0 until nc).flatMap(c => Seq((c + 1).toByte, 0x00.toByte)) ++
        Array[Byte](0, 63, 0)
      seg(0xDA, p)
    }
    var scanBytes = 0L
    def writeScan(len: Int, sd: Int): Unit = {
      val hd = sosHeader()
      out.write(hd, 0, hd.length)
      (0 until len).foreach { k =>
        val v = (sd * 31 + k * 17) % 256
        if (v == 0xFF) {
          out.write(Array(0xFF.toByte, 0x00.toByte), 0, 2); scanBytes += 2
        } else { out.write(v); scanBytes += 1 }
      }
      nSegments += 1
    }
    writeScan(scanLen, seed)
    var nScans = 1L
    if (extraScan) { writeScan(scanLen / 2, seed + 7); nScans += 1 }
    out.write(Array(0xFF.toByte, 0xD9.toByte), 0, 2)
    nSegments += 1
    Built(out.toByteArray, w, h, 8L, nc, prog, nSegments, nDqt,
      dqtCrc.getValue, nDht, dhtCrc.getValue, withJfif, withExif,
      nScans, scanBytes, 0L)
  }

  property("decode reproduces the builder's declared structure") =
    Prop.forAll(builtGen) { bu =>
      val r = JpegInfo.decode(bu.bytes)
      (r != null) :| "decoded" && (r != null) ==> {
        (r.getLong(0) == bu.width) :| s"width ${r.getLong(0)}" &&
          (r.getLong(1) == bu.height) :| "height" &&
          (r.getLong(2) == bu.precision) :| "precision" &&
          (r.getLong(3) == bu.nComp) :| "n_components" &&
          (r.getBoolean(4) == bu.progressive) :| "progressive" &&
          (r.getLong(5) == bu.nSegments) :| s"n_segments ${r.getLong(5)} vs ${bu.nSegments}" &&
          (r.getLong(6) == bu.nDqt) :| "n_dqt" &&
          (r.getLong(7) == bu.dqtCrc) :| "dqt_crc32" &&
          (r.getLong(8) == bu.nDht) :| "n_dht" &&
          (r.getLong(9) == bu.dhtCrc) :| "dht_crc32" &&
          (r.getBoolean(10) == bu.jfif) :| "jfif" &&
          (r.getBoolean(11) == bu.exif) :| "exif" &&
          (r.getLong(12) == bu.nScans) :| "n_scans" &&
          (r.getLong(13) == bu.scanBytes) :| s"scan_bytes ${r.getLong(13)} vs ${bu.scanBytes}" &&
          (r.getLong(14) == bu.nRst) :| "n_rst"
      }
    }

  property("any strict prefix decodes to null (truncation law)") =
    Prop.forAll(for {
      bu <- builtGen
      cut <- Gen.choose(2, bu.bytes.length - 1)
    } yield (bu, cut)) { case (bu, cut) =>
      (JpegInfo.decode(java.util.Arrays.copyOf(bu.bytes, cut)) == null) :|
        s"prefix of $cut/${bu.bytes.length} must be malformed"
    }

  property("any trailing bytes decode to null (tiling law)") =
    Prop.forAll(for {
      bu <- builtGen
      tail <- Gen.nonEmptyListOf(Gen.choose(0, 255))
    } yield (bu, tail.map(_.toByte).toArray)) { case (bu, tail) =>
      (JpegInfo.decode(bu.bytes ++ tail) == null) :| "trailing bytes"
    }

  property("a flipped SOS marker decodes to null (reserved-marker law)") =
    Prop.forAll(builtGen) { bu =>
      val b = bu.bytes.clone()
      var i = 2
      var sos = -1
      while (sos < 0 && i + 1 < b.length) {
        if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA) sos = i + 1
        else i += 1
      }
      b(sos) = 0x7A.toByte
      (JpegInfo.decode(b) == null) :| "flipped marker"
    }
}
