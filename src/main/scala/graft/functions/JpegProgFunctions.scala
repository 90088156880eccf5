package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** PROGRESSIVE JPEG decode (q326) — the decode ladder's most-hit rung
  * (round-12 verdict #2): q315 walks SOF2 files structurally and
  * q316/q325 deliberately VOID them, yet the majority of large web JPEGs
  * are progressive. This decoder implements ISO/IEC 10918-1 Annex G
  * spectral selection + successive approximation for the grayscale
  * profile (SOF2, one component, 8-bit, 1×1 sampling, whole-block
  * dimensions), with the scan-script-agnostic coefficient assembly a
  * real progressive file requires:
  *
  *  - DC first scans (Ss=Se=0, Ah=0): baseline-style DC-difference
  *    Huffman over the point-transformed value; coefficient lands as
  *    `diff-accumulated << Al`.
  *  - DC refinement (Ah>0): ONE raw bit per block ORed in at Al — no
  *    Huffman table involved (two's-complement OR reconstructs negative
  *    DCs exactly, the property the committed generator exploits too).
  *  - AC first scans (Ss≥1, Ah=0): run/size coding over the band with
  *    EOBn symbols — an End-Of-Band RUN of `(1<<r) + receive(r)` blocks
  *    whose band is entirely zero at this approximation level, the
  *    band-skipping machinery baseline JPEG doesn't have.
  *  - AC refinement (Ah>0): the Annex-G correction-bit walk — every
  *    already-significant coefficient passed contributes one buffered
  *    correction bit, newly-significant coefficients arrive as ±1<<Al
  *    with a sign bit, and EOB runs carry correction bits for the
  *    remainder of every band they cover (mirrors libjpeg's
  *    decode_mcu_AC_refine, the de-facto interpretation of G.1.2.3).
  *
  *  Restart markers reset the bit reader, the DC predictor AND the EOB
  *  run per scan. DHT between scans re-targets tables; the trailer rule
  *  is q316's — EOI must close the file exactly, nothing after.
  *
  * The dequant + fixed-point IDCT + stats tail is SHARED with q316
  * ([[JpegPixels.Surface]]) — the two entropy layers render through the
  * same 64 cosine literals, so the expected surface stays bit-exact by
  * construction. Ground truth three ways (tools/gen_jpeg_decode_fixtures
  * .py gen_prog): the generator CHOOSES quantized coefficients by
  * formula and emits them through a libjpeg-mirroring progressive
  * encoder, its independent Python re-decoder proves every scan
  * round-trips, and each progressive file has a BASELINE TWIN built from
  * the identical coefficients — decoded px_crc32 must agree across the
  * two entropy layers (JpegProgSpec pins it). Out-of-profile files
  * (baseline SOF0, multi-component) VOID here exactly as progressive
  * voids under q316 — the profile split is bidirectional.
  *
  * At 100 TB: same in-scan decode shape as q316 — ~70 bytes of stats per
  * image cross the shuffle, never pixels; a malformed scan voids one
  * file (DROPMALFORMED blast radius).
  */
object JpegProg {

  import JpegPixels.{BitReader, Huff, extend, Surface, ZZ}

  private final class Malformed extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private val MaxPixels = 4L * 1024 * 1024 // coef buffer = 4 ints/pixel

  /** struct(width, height, n_blocks, n_rst, px_min, px_max, px_sum,
    * px_sqsum, px_crc32) — q316's exact shape — or null. */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val n = b.length
    def u8(k: Int): Int = { if (k >= n) fail(); b(k) & 0xFF }
    def be16(k: Int): Int = { if (k + 1 >= n) fail(); (u8(k) << 8) | u8(k + 1) }
    try {
      var i = 2
      var width = -1; var height = -1
      val qtables = new Array[Array[Int]](4)
      var qtId = -1
      val huffDc = new Array[Huff](4)
      val huffAc = new Array[Huff](4)
      var rstInterval = 0
      var sofSeen = false
      var coefs: Array[Int] = null // nBlocks × 64, zigzag order
      var nBlocks = 0
      var nRst = 0L
      var eoi = false
      while (!eoi) {
        if (u8(i) != 0xFF) fail()
        while (u8(i) == 0xFF) i += 1
        val m = u8(i); i += 1
        if (m == 0xD9) { // EOI: must close the file exactly
          if (i != n) fail()
          eoi = true
        } else if (m == 0xD8 || m <= 0xBF) fail() // second SOI / reserved
        else {
          val len = be16(i)
          if (len < 2 || i + len > n) fail()
          val p = i + 2
          val plen = len - 2
          m match {
            case 0xC2 => // SOF2 progressive, grayscale profile
              if (sofSeen || plen != 9) fail()
              sofSeen = true
              if (u8(p) != 8) fail()
              height = be16(p + 1); width = be16(p + 3)
              if (u8(p + 5) != 1) fail()
              if (u8(p + 7) != 0x11) fail()
              qtId = u8(p + 8)
              if (width < 1 || height < 1 || width % 8 != 0 || height % 8 != 0)
                fail()
              if (width.toLong * height > MaxPixels) fail()
              nBlocks = (width / 8) * (height / 8)
              coefs = new Array[Int](nBlocks * 64)
            case 0xC0 | 0xC1 | 0xC3 => fail() // baseline/sequential: q316's job
            case 0xC4 =>
              var off = 0
              while (off < plen) {
                val tcth = u8(p + off)
                val tc = tcth >> 4; val th = tcth & 0x0F
                if (tc > 1 || th > 3 || off + 17 > plen) fail()
                val counts = new Array[Int](16)
                var sum = 0
                var k = 0
                while (k < 16) { counts(k) = u8(p + off + 1 + k); sum += counts(k); k += 1 }
                if (off + 17 + sum > plen) fail()
                val syms = new Array[Int](sum)
                k = 0
                while (k < sum) { syms(k) = u8(p + off + 17 + k); k += 1 }
                val h = new Huff(counts, syms)
                if (tc == 0) huffDc(th) = h else huffAc(th) = h
                off += 17 + sum
              }
              if (off != plen) fail()
            case 0xDB =>
              var off = 0
              while (off < plen) {
                val pqtq = u8(p + off)
                if ((pqtq >> 4) > 1 || (pqtq & 0x0F) > 3) fail()
                val sz = 64 * ((pqtq >> 4) + 1)
                if (off + 1 + sz > plen) fail()
                if ((pqtq >> 4) == 0) {
                  val t = new Array[Int](64)
                  var k = 0
                  while (k < 64) { t(k) = u8(p + off + 1 + k); k += 1 }
                  qtables(pqtq & 0x0F) = t
                }
                off += 1 + sz
              }
              if (off != plen) fail()
            case 0xDD =>
              if (plen != 2) fail()
              rstInterval = be16(p)
            case 0xDA =>
              if (!sofSeen || plen != 6) fail()
              if (u8(p) != 1) fail()
              val dcSel = u8(p + 2) >> 4; val acSel = u8(p + 2) & 0x0F
              val ss = u8(p + 3); val se = u8(p + 4)
              val ah = u8(p + 5) >> 4; val al = u8(p + 5) & 0x0F
              // scan-header legality (G.1.1.1.1): DC scans are the single
              // (0,0) band; AC bands live in 1..63; refinement steps one
              // bit at a time; Al is bounded so `<< al` stays in Int
              if (ss == 0) { if (se != 0) fail() }
              else if (se < ss || se > 63) fail()
              if (ah != 0 && al != ah - 1) fail()
              if (al > 13 || ah > 13) fail()
              val (scanEnd, rstAfter) = decodeScan(b, i + len, n, coefs,
                nBlocks,
                if (ss == 0 && ah == 0) huffDc(dcSel) else null,
                if (ss > 0) huffAc(acSel) else null,
                ss, se, ah, al, rstInterval, nRst)
              nRst = rstAfter
              i = scanEnd - len // the shared `i += len` below lands on scanEnd
            case x if x >= 0xE0 && x <= 0xEF => ()
            case 0xFE => ()
            case _ => fail()
          }
          i += len
        }
      }
      if (!sofSeen || coefs == null) fail()
      val qt = qtables(qtId)
      if (qt == null) fail()
      // ---- shared dequant + IDCT tail (q316's Surface) -------------------
      val bw = width / 8
      val surf = new Surface(width, height)
      val m = Array.ofDim[Long](8, 8)
      var bi = 0
      while (bi < nBlocks) {
        var r = 0
        while (r < 8) { java.util.Arrays.fill(m(r), 0L); r += 1 }
        var k = 0
        while (k < 64) {
          val v = coefs(bi * 64 + k)
          if (v != 0) m(ZZ(k) / 8)(ZZ(k) % 8) = v.toLong * qt(k)
          k += 1
        }
        surf.idct(m, bi / bw, bi % bw)
        bi += 1
      }
      InternalRow(width.toLong, height.toLong, nBlocks.toLong, nRst,
        surf.pMin, surf.pMax, surf.pSum, surf.pSq, surf.crc32)
    } catch {
      case _: Malformed => null
      case _: JpegPixels.Malformed => null // Huff/BitReader internals
    }
  }

  /** Decode one scan's entropy data starting at `start`; returns (the
    * byte offset just past the scan — at the 0xFF of the next marker —
    * and the cumulative restart count). Mutates `coefs`. */
  private def decodeScan(b: Array[Byte], start: Int, n: Int,
      coefs: Array[Int], nBlocks: Int, dcH: Huff, acH: Huff,
      ss: Int, se: Int, ah: Int, al: Int, rstInterval: Int,
      rst0: Long): (Int, Long) = {
    if (coefs == null) fail()
    val dcScan = ss == 0
    if (dcScan && ah == 0 && dcH == null) fail()
    if (!dcScan && acH == null) fail()
    var br = new BitReader(b, start, n)
    var pred = 0
    var eobrun = 0
    var nRst = rst0
    def u8(k: Int): Int = { if (k >= n) fail(); b(k) & 0xFF }
    val p1 = 1 << al
    val m1 = -1 << al
    var bi = 0
    while (bi < nBlocks) {
      if (rstInterval > 0 && bi > 0 && bi % rstInterval == 0) {
        val at = br.i
        if (u8(at) != 0xFF || u8(at + 1) != 0xD0 + (nRst % 8).toInt) fail()
        br = new BitReader(b, at + 2, n)
        nRst += 1
        pred = 0
        eobrun = 0
      }
      val base = bi * 64
      if (dcScan) {
        if (ah == 0) { // DC first
          val s = dcH.decode(br)
          if (s > 11) fail()
          pred += extend(br.bits(s), s)
          if (pred < -65536 || pred > 65536) fail()
          coefs(base) = pred << al
        } else { // DC refinement: one raw bit, ORed in two's complement
          if (br.bit() != 0) coefs(base) |= p1
        }
      } else if (ah == 0) { // AC first scan (G.1.2.2)
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var done = false
          while (k <= se && !done) {
            val sym = acH.decode(br)
            val r = sym >> 4; val s = sym & 0x0F
            if (s != 0) {
              k += r
              if (k > se) fail()
              coefs(base + k) = extend(br.bits(s), s) << al
              k += 1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              eobrun -= 1 // this block's end-of-band included
              done = true
            } else k += 16 // ZRL
          }
        }
      } else { // AC refinement (G.1.2.3, libjpeg decode_mcu_AC_refine)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val sym = acH.decode(br)
            var r = sym >> 4
            val s0 = sym & 0x0F
            var newval = 0
            if (s0 != 0) {
              if (s0 != 1) fail() // refinement carries only ±1 at this bit
              newval = if (br.bit() != 0) p1 else m1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              done = true
            }
            if (!done) {
              // advance over r zero-HISTORY coefficients, emitting a
              // correction bit for every nonzero-history one passed;
              // stop AT the (r+1)-th zero (the placement slot)
              var atSlot = false
              while (k <= se && !atSlot) {
                val c = coefs(base + k)
                if (c != 0) {
                  if (br.bit() != 0 && (c & p1) == 0)
                    coefs(base + k) = c + (if (c >= 0) p1 else m1)
                  k += 1
                } else {
                  r -= 1
                  if (r < 0) atSlot = true else k += 1
                }
              }
              if (newval != 0) {
                if (!atSlot) fail() // band ended before the target zero
                coefs(base + k) = newval
              }
              k += 1 // past the placement slot / consumed zero
            }
          }
        }
        if (eobrun > 0) {
          // correction bits for the remainder of the band
          while (k <= se) {
            val c = coefs(base + k)
            if (c != 0) {
              if (br.bit() != 0 && (c & p1) == 0)
                coefs(base + k) = c + (if (c >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }
      bi += 1
    }
    // byte-align; the next thing must be a marker (FF xx)
    val j = br.i
    if (u8(j) != 0xFF) fail()
    (j, nRst)
  }
}

/** jpeg_prog_pixels(content) -> q316's 9-field struct or null. */
case class JpegProgExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_rst", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_sqsum", LongType, nullable = false),
    StructField("px_crc32", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_prog_pixels"

  override def nullSafeEval(v: Any): Any =
    JpegProg.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.JpegProg.decode($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
