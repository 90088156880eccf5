package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** PROGRESSIVE COLOR JPEG decode (q332) — the profile most large web
  * photographs actually ship: SOF2 + YCbCr 4:2:0. Progressive color
  * adds the one structural rule grayscale (q326) could not show:
  * Annex G allows DC scans to be INTERLEAVED (all three components in
  * MCU order — 4 Y blocks in 2×2 raster + Cb + Cr, per-component
  * predictors) while AC scans MUST be NON-INTERLEAVED — one component
  * per scan, its blocks walked in the COMPONENT'S OWN raster (for Y
  * that is the full-resolution 8×8-block grid, NOT MCU order; for
  * chroma the downsampled grid). The coefficient machinery per scan is
  * q326's verbatim (EOB runs, correction-bit refinement, point
  * transforms); the dequant → integer IDCT → NN chroma upsample →
  * 2^16 fixed-point JFIF color convert tail uses the SAME cosine and
  * conversion literals as q325 ([[JpegPixels.K]], [[JpegRgb.CrR]]/…),
  * so the RGB surface is bit-exact by construction.
  *
  * Ground truth three ways (tools/gen_jpeg_decode_fixtures.py
  * gen_prog_color): generator-chosen quantized coefficients reusing
  * q325's color_coefs formula, an independent Python re-decoder per
  * scan, and a BASELINE COLOR TWIN built from identical coefficients —
  * the q325 and q332 entropy layers must land the same px_crc32
  * (JpegProgColorSpec pins it). Out-of-profile files (baseline SOF0
  * color, grayscale progressive) VOID here; the committed grayscale
  * progressive fixtures void too — the profile split is three-way now
  * (q316 baseline-gray / q325 baseline-color / q326 prog-gray / q332
  * prog-color each accept exactly their own).
  *
  * Profile: SOF2, 3 components, 8-bit, Y 2×2 + chroma 1×1 sampling,
  * dimensions multiple of 16, no DRI (progressive restart intervals
  * void rather than risk a mis-decode — the honest-boundary rule).
  * At 100 TB: the same in-scan decode shape as the whole family.
  */
object JpegProgColor {

  import JpegPixels.{BitReader, Huff, extend, ZZ, K}

  private final class Malformed extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private val MaxPixels = 2L * 1024 * 1024

  /** q325's exact 9-field struct or null. */
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
      val tqOf = new Array[Int](3)
      val huffDc = new Array[Huff](4)
      val huffAc = new Array[Huff](4)
      var sofSeen = false
      // per-component coefficient buffers (zigzag order per block)
      var coefs: Array[Array[Int]] = null
      var blocksW: Array[Int] = null // blocks per row, per component
      var blocksH: Array[Int] = null
      var mcuW = 0; var mcuH = 0
      var eoi = false
      while (!eoi) {
        if (u8(i) != 0xFF) fail()
        while (u8(i) == 0xFF) i += 1
        val m = u8(i); i += 1
        if (m == 0xD9) {
          if (i != n) fail()
          eoi = true
        } else if (m == 0xD8 || m <= 0xBF) fail()
        else {
          val len = be16(i)
          if (len < 2 || i + len > n) fail()
          val p = i + 2
          val plen = len - 2
          m match {
            case 0xC2 =>
              if (sofSeen || plen != 15) fail() // 3 components
              sofSeen = true
              if (u8(p) != 8) fail()
              height = be16(p + 1); width = be16(p + 3)
              if (u8(p + 5) != 3) fail()
              // component 1 = Y 2x2, 2/3 = chroma 1x1 (ids 1..3)
              var c = 0
              while (c < 3) {
                if (u8(p + 6 + 3 * c) != c + 1) fail()
                val samp = u8(p + 7 + 3 * c)
                if (c == 0 && samp != 0x22) fail()
                if (c > 0 && samp != 0x11) fail()
                tqOf(c) = u8(p + 8 + 3 * c)
                if (tqOf(c) > 3) fail()
                c += 1
              }
              if (width < 1 || height < 1 || width % 16 != 0 ||
                height % 16 != 0) fail()
              if (width.toLong * height > MaxPixels) fail()
              mcuW = width / 16; mcuH = height / 16
              blocksW = Array(width / 8, mcuW, mcuW)
              blocksH = Array(height / 8, mcuH, mcuH)
              coefs = Array.tabulate(3)(c2 =>
                new Array[Int](blocksW(c2) * blocksH(c2) * 64))
            case 0xC0 | 0xC1 | 0xC3 => fail() // baseline: q325's job
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
            case 0xDD => fail() // DRI out of the progressive-color profile
            case 0xDA =>
              if (!sofSeen) fail()
              val ns = u8(p)
              if (plen != 1 + 2 * ns + 3) fail()
              val ss = u8(p + 1 + 2 * ns); val se = u8(p + 2 + 2 * ns)
              val ahal = u8(p + 3 + 2 * ns)
              val ah = ahal >> 4; val al = ahal & 0x0F
              if (ah != 0 && al != ah - 1) fail()
              if (al > 13 || ah > 13) fail()
              val scanEnd =
                if (ns == 3) {
                  // interleaved: DC scans only (Annex G rule)
                  if (ss != 0 || se != 0) fail()
                  var c = 0
                  while (c < 3) {
                    if (u8(p + 1 + 2 * c) != c + 1) fail()
                    c += 1
                  }
                  val dcSel = Array.tabulate(3)(c2 => u8(p + 2 + 2 * c2) >> 4)
                  decodeDcInterleaved(b, i + len, n, coefs, mcuW, mcuH,
                    if (ah == 0) dcSel.map(s => {
                      val h = huffDc(s); if (h == null) fail(); h
                    }) else null, ah, al)
                } else if (ns == 1) {
                  val cid = u8(p + 1)
                  if (cid < 1 || cid > 3) fail()
                  val c = cid - 1
                  val dcSel = u8(p + 2) >> 4; val acSel = u8(p + 2) & 0x0F
                  if (ss == 0) { if (se != 0) fail() }
                  else if (se < ss || se > 63) fail()
                  // a non-interleaved scan walks the COMPONENT raster
                  decodeScanOne(b, i + len, n, coefs(c),
                    blocksW(c) * blocksH(c),
                    if (ss == 0 && ah == 0) {
                      val h = huffDc(dcSel); if (h == null) fail(); h
                    } else null,
                    if (ss > 0) {
                      val h = huffAc(acSel); if (h == null) fail(); h
                    } else null,
                    ss, se, ah, al)
                } else fail()
              i = scanEnd - len
            case x if x >= 0xE0 && x <= 0xEF => ()
            case 0xFE => ()
            case _ => fail()
          }
          i += len
        }
      }
      if (!sofSeen || coefs == null) fail()
      val qt = tqOf.map(q => { val t = qtables(q); if (t == null) fail(); t })
      // ---- render: dequant + IDCT + NN upsample + JFIF convert ----------
      // (q325's exact integer recipe; cosine + conversion literals shared)
      val m = Array.ofDim[Long](8, 8)
      val blk = new Array[Int](64)
      def idctBlock(c: Int, bi: Int): Unit = {
        var r = 0
        while (r < 8) { java.util.Arrays.fill(m(r), 0L); r += 1 }
        var k = 0
        while (k < 64) {
          val v = coefs(c)(bi * 64 + k)
          if (v != 0) m(ZZ(k) / 8)(ZZ(k) % 8) = v.toLong * qt(c)(k)
          k += 1
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0L
            var a = 0
            while (a < 8) {
              var inner = 0L
              var cc = 0
              while (cc < 8) { inner += K(x)(cc) * m(a)(cc); cc += 1 }
              acc += K(y)(a) * inner
              a += 1
            }
            var v = 128L + ((acc + (1L << 21)) >> 22)
            if (v < 0) v = 0
            if (v > 255) v = 255
            blk(y * 8 + x) = v.toInt
            x += 1
          }
          y += 1
        }
      }
      val rgb = new Array[Byte](width * height * 3)
      val yTile = new Array[Int](256)
      val cbT = new Array[Int](64)
      val crT = new Array[Int](64)
      var pMin = 255L; var pMax = 0L; var pSum = 0L; var pSq = 0L
      val nMcus = mcuW * mcuH
      var mi = 0
      while (mi < nMcus) {
        val my = mi / mcuW; val mx = mi % mcuW
        var t = 0
        while (t < 4) {
          val by = my * 2 + t / 2; val bx = mx * 2 + t % 2
          idctBlock(0, by * blocksW(0) + bx)
          val oy = (t / 2) * 8; val ox = (t % 2) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              yTile((oy + y) * 16 + ox + x) = blk(y * 8 + x)
              x += 1
            }
            y += 1
          }
          t += 1
        }
        idctBlock(1, my * blocksW(1) + mx); System.arraycopy(blk, 0, cbT, 0, 64)
        idctBlock(2, my * blocksW(2) + mx); System.arraycopy(blk, 0, crT, 0, 64)
        var py = 0
        while (py < 16) {
          var px = 0
          while (px < 16) {
            val yv = yTile(py * 16 + px)
            val cb = cbT((py / 2) * 8 + px / 2) - 128
            val cr = crT((py / 2) * 8 + px / 2) - 128
            var r = yv + ((JpegRgb.CrR * cr + 32768) >> 16)
            var g = yv - ((JpegRgb.CbG * cb + JpegRgb.CrG * cr + 32768) >> 16)
            var bl = yv + ((JpegRgb.CbB * cb + 32768) >> 16)
            if (r < 0) r = 0; if (r > 255) r = 255
            if (g < 0) g = 0; if (g > 255) g = 255
            if (bl < 0) bl = 0; if (bl > 255) bl = 255
            val base = ((my * 16 + py) * width + mx * 16 + px) * 3
            rgb(base) = r.toByte; rgb(base + 1) = g.toByte
            rgb(base + 2) = bl.toByte
            var q = 0
            while (q < 3) {
              val v = (rgb(base + q) & 0xFF).toLong
              if (v < pMin) pMin = v
              if (v > pMax) pMax = v
              pSum += v; pSq += v * v
              q += 1
            }
            px += 1
          }
          py += 1
        }
        mi += 1
      }
      val crc = new java.util.zip.CRC32
      crc.update(rgb)
      InternalRow(width.toLong, height.toLong, nMcus.toLong, 0L,
        pMin, pMax, pSum, pSq, crc.getValue)
    } catch {
      case _: Malformed => null
      case _: JpegPixels.Malformed => null
    }
  }

  /** Interleaved DC scan over MCUs (first when dcH != null, refinement
    * otherwise); returns the offset of the trailing marker's 0xFF. */
  private def decodeDcInterleaved(b: Array[Byte], start: Int, n: Int,
      coefs: Array[Array[Int]], mcuW: Int, mcuH: Int,
      dcH: Array[Huff], ah: Int, al: Int): Int = {
    val br = new BitReader(b, start, n)
    val pred = new Array[Int](3)
    val p1 = 1 << al
    val yBlocksW = mcuW * 2
    var mi = 0
    val nMcus = mcuW * mcuH
    while (mi < nMcus) {
      val my = mi / mcuW; val mx = mi % mcuW
      var t = 0
      while (t < 6) {
        val c = if (t < 4) 0 else t - 3 // 0,0,0,0,1,2
        val bi =
          if (t < 4) (my * 2 + t / 2) * yBlocksW + (mx * 2 + t % 2)
          else my * mcuW + mx
        if (ah == 0) {
          val s = dcH(c).decode(br)
          if (s > 11) fail()
          pred(c) += extend(br.bits(s), s)
          if (pred(c) < -65536 || pred(c) > 65536) fail()
          coefs(c)(bi * 64) = pred(c) << al
        } else {
          if (br.bit() != 0) coefs(c)(bi * 64) |= p1
        }
        t += 1
      }
      mi += 1
    }
    val j = br.i
    if (j >= n || (b(j) & 0xFF) != 0xFF) fail()
    j
  }

  /** Non-interleaved scan over one component's raster — q326's scan
    * machinery verbatim (DC first/refine for the single component, AC
    * first with EOB runs, AC refinement with correction bits). */
  private def decodeScanOne(b: Array[Byte], start: Int, n: Int,
      coefs: Array[Int], nBlocks: Int, dcH: Huff, acH: Huff,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    val dcScan = ss == 0
    if (dcScan && ah == 0 && dcH == null) fail()
    if (!dcScan && acH == null) fail()
    val br = new BitReader(b, start, n)
    var pred = 0
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al
    var bi = 0
    while (bi < nBlocks) {
      val base = bi * 64
      if (dcScan) {
        if (ah == 0) {
          val s = dcH.decode(br)
          if (s > 11) fail()
          pred += extend(br.bits(s), s)
          if (pred < -65536 || pred > 65536) fail()
          coefs(base) = pred << al
        } else {
          if (br.bit() != 0) coefs(base) |= p1
        }
      } else if (ah == 0) { // AC first
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
              eobrun -= 1
              done = true
            } else k += 16
          }
        }
      } else { // AC refinement
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val sym = acH.decode(br)
            var r = sym >> 4
            val s0 = sym & 0x0F
            var newval = 0
            if (s0 != 0) {
              if (s0 != 1) fail()
              newval = if (br.bit() != 0) p1 else m1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              done = true
            }
            if (!done) {
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
                if (!atSlot) fail()
                coefs(base + k) = newval
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
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
    val j = br.i
    if (j >= n || (b(j) & 0xFF) != 0xFF) fail()
    j
  }
}

/** jpeg_prog_rgb(content) -> q325's 9-field struct or null. */
case class JpegProgRgbExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_mcus", LongType, nullable = false),
    StructField("n_rst", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_sqsum", LongType, nullable = false),
    StructField("px_crc32", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_prog_rgb"

  override def nullSafeEval(v: Any): Any =
    JpegProgColor.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.JpegProgColor.decode($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
