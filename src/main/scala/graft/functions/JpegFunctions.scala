package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** JPEG segment walk (q315) — the missing crawl image format (round-11
  * verdict #4): PNG/WAV/AVI/PDF are decoded by this family already, but
  * >70% of real crawl images are JPEG. Scope is the exactly-specifiable
  * SEGMENT layer of ISO/IEC 10918-1 + JFIF/EXIF app markers (the q283
  * wire-format discipline — structure, tiling and checksums; no DCT):
  *
  *  - SOI → EOI marker tiling: the byte range must START with SOI, every
  *    segment's 2-byte big-endian length must land inside the file, the
  *    walk must reach EOI, and NOTHING may follow it — truncation and
  *    trailing garbage both void the file (DROPMALFORMED blast radius =
  *    one file, never a scan failure).
  *  - SOF0 (baseline) / SOF2 (progressive): precision, height, width,
  *    component count (1–4) with per-component quant-table refs ≤ 3 and
  *    the exact 8+3·n segment length. Any OTHER SOF type (arithmetic,
  *    lossless, differential — C1/C3/C5–CB/CD–CF) is out of scope and
  *    voids the file rather than mis-reporting it.
  *  - DQT/DHT INTERNAL tiling: quant segments must tile into (Pq,Tq)+64
  *    or +128-byte entries (Pq ≤ 1, Tq ≤ 3), Huffman segments into
  *    (Tc,Th)+16 counts+Σcounts symbols (Tc ≤ 1, Th ≤ 3), each consuming
  *    its payload EXACTLY; table payloads fold into per-kind CRC32s so
  *    the oracle pins table BYTES, not just counts.
  *  - SOS entropy walk: 0xFF is stuffed as FF 00, RST0–7 pass through
  *    (counted), FF-fill before a marker is legal; the scan ends at the
  *    first real marker. Multi-scan progressive files walk DHT/SOS
  *    sequences until EOI. RST outside a scan, a second SOI, or any
  *    reserved marker (0x02–0xBF) voids the file.
  *  - APP0 "JFIF\0" and APP1 "Exif\0\0" signatures surface as booleans.
  *
  * Ground truth: the committed fixture set's manifest records what the
  * files were BUILT with (tools/gen_jpeg_fixtures.py), re-validated by
  * the generator's own independent segment parser; JpegLawsSpec
  * round-trips an independent Scala builder against this decoder with
  * truncation/flip/trailing corruption properties. At 100 TB the walk
  * runs inside the scan projection over a binaryFile source: ~100 bytes
  * of dimensions/counts/CRCs per image cross the shuffle, never pixels.
  */
object JpegInfo {

  private final class Malformed extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** struct(width, height, precision, n_components, progressive,
    * n_segments, n_dqt, dqt_crc32, n_dht, dht_crc32, jfif, exif,
    * n_scans, scan_bytes, n_rst) or null for malformed bytes (keep in
    * sync with tools/gen_jpeg_fixtures.py `walk`). */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val n = b.length
    var i = 2
    var nSegments = 1L // SOI
    var nDqt = 0L; var nDht = 0L; var nScans = 0L
    var scanBytes = 0L; var nRst = 0L
    var width = -1L; var height = -1L; var precision = -1L; var nComp = -1L
    var progressive = false
    var jfif = false; var exif = false
    var sofSeen = false
    var eoi = false
    val dqtCrc = new java.util.zip.CRC32
    val dhtCrc = new java.util.zip.CRC32
    def u8(k: Int): Int = { if (k >= n) fail(); b(k) & 0xFF }
    def be16(k: Int): Int = { if (k + 1 >= n) fail(); (u8(k) << 8) | u8(k + 1) }
    try {
      while (!eoi) {
        if (u8(i) != 0xFF) fail()
        while (u8(i) == 0xFF) i += 1 // marker prefix + optional FF fill
        val m = u8(i); i += 1
        m match {
          case 0xD9 =>
            nSegments += 1; eoi = true
          case 0xD8 => fail() // second SOI
          case x if x <= 0x01 || (x >= 0xD0 && x <= 0xD7) =>
            fail() // TEM/reserved/RST outside a scan
          case x if x >= 0x02 && x <= 0xBF =>
            fail() // reserved marker range
          case _ =>
            val len = be16(i)
            if (len < 2 || i + len > n) fail()
            val p = i + 2
            val plen = len - 2
            m match {
              case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
                if (sofSeen) fail()
                sofSeen = true
                progressive = m == 0xC2
                if (plen < 6) fail()
                precision = u8(p)
                height = be16(p + 1)
                width = be16(p + 3)
                nComp = u8(p + 5)
                if (width < 1 || height < 1 || nComp < 1 || nComp > 4) fail()
                if (plen != 6 + 3 * nComp) fail()
                var c = 0
                while (c < nComp) {
                  if ((u8(p + 6 + 3 * c + 2) & 0xFF) > 3) fail() // Tq ref
                  c += 1
                }
              case 0xC4 => // DHT: (Tc,Th) + 16 counts + symbols, exact tile
                var off = 0
                while (off < plen) {
                  val tcth = u8(p + off)
                  if ((tcth >> 4) > 1 || (tcth & 0x0F) > 3) fail()
                  if (off + 17 > plen) fail()
                  var sum = 0
                  var k = 0
                  while (k < 16) { sum += u8(p + off + 1 + k); k += 1 }
                  if (off + 17 + sum > plen) fail()
                  nDht += 1
                  off += 17 + sum
                }
                if (off != plen) fail()
                dhtCrc.update(b, p, plen)
              case 0xDB => // DQT: (Pq,Tq) + 64/128 bytes, exact tile
                var off = 0
                while (off < plen) {
                  val pqtq = u8(p + off)
                  val pq = pqtq >> 4
                  if (pq > 1 || (pqtq & 0x0F) > 3) fail()
                  val sz = 1 + 64 * (pq + 1)
                  if (off + sz > plen) fail()
                  nDqt += 1
                  off += sz
                }
                if (off != plen) fail()
                dqtCrc.update(b, p, plen)
              case 0xDD => // DRI
                if (plen != 2) fail()
              case 0xDA => // SOS header, then the entropy-coded walk
                if (!sofSeen) fail()
                if (plen < 1) fail()
                val ns = u8(p)
                if (ns < 1 || ns > 4 || plen != 1 + 2 * ns + 3) fail()
                nScans += 1
                var j = i + len
                var done = false
                while (!done) {
                  if (j >= n) fail() // truncated mid-scan
                  if (u8(j) != 0xFF) { scanBytes += 1; j += 1 }
                  else {
                    val nx = u8(j + 1) // u8 bounds-checks
                    if (nx == 0x00) { scanBytes += 2; j += 2 }
                    else if (nx >= 0xD0 && nx <= 0xD7) {
                      nRst += 1; scanBytes += 2; j += 2
                    } else if (nx == 0xFF) { scanBytes += 1; j += 1 } // fill
                    else done = true
                  }
                }
                i = j - len // so the shared `i += len` lands on the marker
              case x if x >= 0xE0 && x <= 0xEF => // APPn
                if (x == 0xE0 && plen >= 5 &&
                    u8(p) == 'J' && u8(p + 1) == 'F' && u8(p + 2) == 'I' &&
                    u8(p + 3) == 'F' && u8(p + 4) == 0x00) jfif = true
                if (x == 0xE1 && plen >= 6 &&
                    u8(p) == 'E' && u8(p + 1) == 'x' && u8(p + 2) == 'i' &&
                    u8(p + 3) == 'f' && u8(p + 4) == 0x00 &&
                    u8(p + 5) == 0x00) exif = true
              case 0xFE => () // COM
              case _ => fail()
            }
            nSegments += 1
            i += len
        }
      }
      if (i != n) fail() // trailing bytes after EOI break the tiling
      if (!sofSeen || nScans < 1) fail()
    } catch { case _: Malformed => return null }
    InternalRow(width, height, precision, nComp, progressive, nSegments,
      nDqt, dqtCrc.getValue, nDht, dhtCrc.getValue, jfif, exif,
      nScans, scanBytes, nRst)
  }
}

/** jpeg_info(content) -> struct<...> or null (see [[JpegInfo.decode]]). */
case class JpegInfoExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("precision", LongType, nullable = false),
    StructField("n_components", LongType, nullable = false),
    StructField("progressive", BooleanType, nullable = false),
    StructField("n_segments", LongType, nullable = false),
    StructField("n_dqt", LongType, nullable = false),
    StructField("dqt_crc32", LongType, nullable = false),
    StructField("n_dht", LongType, nullable = false),
    StructField("dht_crc32", LongType, nullable = false),
    StructField("jfif", BooleanType, nullable = false),
    StructField("exif", BooleanType, nullable = false),
    StructField("n_scans", LongType, nullable = false),
    StructField("scan_bytes", LongType, nullable = false),
    StructField("n_rst", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_info"

  override def nullSafeEval(v: Any): Any =
    JpegInfo.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.JpegInfo.decode($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jpeg_info", exprs => JpegInfoExpr(exprs.head), "built-in")
  }
}
