package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** FULL-PROFILE PNG decode (q333) — the rungs q167's truecolor decoder
  * deliberately left out, closed the same way q326/q332 closed JPEG's:
  *
  *  - color type 0 (grayscale, 1 channel) and 3 (PALETTE — the most
  *    common web-icon profile: indexes mapped through the PLTE chunk,
  *    ≤256 3-byte entries, an index past the palette VOIDS the file),
  *    alongside 2/6 (RGB/RGBA);
  *  - ADAM7 INTERLACE: seven passes, each an independent sub-image
  *    with its own scanline filters (all five types) and its own
  *    filter neighborhood, empty passes carrying NO bytes, the pass
  *    pixels scattered back to (xStart + i·xStep, yStart + j·yStep) —
  *    so the output surface — and its CRC — is the LOGICAL image.
  *
  * Output is stats + CRC32 over the row-major RECONSTRUCTED surface
  * (palette expanded to its RGB triples — decode means pixels, not
  * indexes; gray stays 1 channel, RGB(A) as stored), every sample
  * pinned, none shuffled. Profile: 8-bit depth; anything else — 16-bit,
  * 1/2/4-bit packed, gray+alpha — voids rather than mis-decodes, and
  * q167's png_pixels keeps its exact historical contract (types 2/6
  * non-interlaced only): PngFullSpec pins that the NEW profiles void
  * under the OLD expression and decode here — the q316/q326 layer
  * discipline applied within one format. Ground truth: the committed
  * generator (tools/gen_png_full_fixtures.py) writes every profile ×
  * filter-type combination with zlib and per-row filter choices, and
  * the manifest carries stats computed from the planted sample
  * formulas, never from a decoder.
  */
object PngFull {

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)
  private val MaxDecodedBytes = 64L * 1024 * 1024

  // Adam7 pass geometry: xStart, yStart, xStep, yStep
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** struct(width, height, color_type, palette_size, interlaced,
    * n_passes, px_min, px_max, px_sum, px_sqsum, px_crc32) or null. */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 33) return null
    var i = 0
    while (i < 8) { if (b(i) != Sig(i)) return null; i += 1 }
    if (be32(b, 8) != 13L) return null
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    val width = be32(b, 16).toInt
    val height = be32(b, 20).toInt
    val depth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    val interlace = b(28) & 0xFF
    if (depth != 8 || b(26) != 0 || b(27) != 0) return null
    if (interlace > 1) return null
    val nchan = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1
      case 6 => 4
      case _ => return null
    }
    if (width <= 0 || height <= 0) return null
    // chunk walk: PLTE (required for type 3, before IDAT) + IDATs + IEND
    var pos = 33
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var ended = false
    while (!ended && pos + 8 <= b.length) {
      val size = be32(b, pos)
      if (size < 0 || pos + 12 + size > b.length) return null
      val tag = new String(b, pos + 4, 4, "ISO-8859-1")
      tag match {
        case "PLTE" =>
          if (size % 3 != 0 || size == 0 || size > 768) return null
          if (idat.size() > 0) return null // PLTE must precede IDAT
          plte = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size.toInt)
        case "IDAT" => idat.write(b, pos + 8, size.toInt)
        case "IEND" => ended = true
        case _ => ()
      }
      pos += 12 + size.toInt
    }
    if (!ended || idat.size() == 0) return null
    if (colorType == 3 && plte == null) return null
    val palEntries = if (plte == null) 0 else plte.length / 3

    // expected inflated size: sum over passes (or the single pass)
    def passDims(p: Int): (Int, Int) = {
      val (x0, y0, dx, dy) = Adam7(p)
      (((width - x0 + dx - 1) / dx) max 0, ((height - y0 + dy - 1) / dy) max 0)
    }
    val passes: Seq[(Int, Int, Int)] = // (passIdx, pw, ph), data-carrying
      if (interlace == 0) Seq((-1, width, height))
      else (0 until 7).map(p => { val (pw, ph) = passDims(p); (p, pw, ph) })
        .filter(t => t._2 > 0 && t._3 > 0)
    val expectedL = passes.map { case (_, pw, ph) =>
      ph.toLong * (1L + pw.toLong * nchan)
    }.sum
    if (expectedL <= 0L || expectedL > MaxDecodedBytes) return null
    val expected = expectedL.toInt
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(raw, off, expected - off)
        if (n == 0 && !inf.finished()) return null
        off += n
      }
      if (off != expected) return null
      // a stream with MORE scanlines than the geometry demands is
      // malformed: drain one probe byte
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        if (inf.inflate(probe, 0, 1) > 0) return null
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // the channel surface in LOGICAL order (de-interlaced)
    val surface = new Array[Byte](width * height * nchan)
    var rawOff = 0
    var ok = true
    passes.foreach { case (p, pw, ph) =>
      if (ok) {
        val stride = pw * nchan
        val cur = new Array[Int](stride)
        val prior = new Array[Int](stride)
        java.util.Arrays.fill(prior, 0)
        var y = 0
        while (y < ph && ok) {
          val base = rawOff + y * (1 + stride)
          val f = raw(base) & 0xFF
          if (f > 4) ok = false
          else {
            var k = 0
            while (k < stride) {
              val x = raw(base + 1 + k) & 0xFF
              val left = if (k >= nchan) cur(k - nchan) else 0
              val up = prior(k)
              val upLeft = if (k >= nchan) prior(k - nchan) else 0
              val pred = f match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) / 2
                case 4 =>
                  val pp = left + up - upLeft
                  val pa = math.abs(pp - left)
                  val pb = math.abs(pp - up)
                  val pc = math.abs(pp - upLeft)
                  if (pa <= pb && pa <= pc) left
                  else if (pb <= pc) up else upLeft
              }
              cur(k) = (x + pred) & 0xFF
              k += 1
            }
            // scatter the pass scanline into the logical surface
            if (p < 0) {
              var px = 0
              while (px < stride) {
                surface(y * stride + px) = cur(px).toByte
                px += 1
              }
            } else {
              val (x0, y0, dx, dy) = Adam7(p)
              val destY = y0 + y.toLong * dy
              var px = 0
              while (px < pw) {
                val destX = x0 + px * dx
                var c = 0
                while (c < nchan) {
                  surface(((destY * width) + destX).toInt * nchan + c) =
                    cur(px * nchan + c).toByte
                  c += 1
                }
                px += 1
              }
            }
            System.arraycopy(cur, 0, prior, 0, stride)
          }
          y += 1
        }
        rawOff += ph * (1 + stride)
      }
    }
    if (!ok) return null
    // palette expansion + stats + CRC over the FINAL surface
    var pMin = 255L; var pMax = 0L; var pSum = 0L; var pSq = 0L
    val crc = new java.util.zip.CRC32
    if (colorType == 3) {
      val row = new Array[Byte](width * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val idx = surface(y * width + x) & 0xFF
          if (idx >= palEntries) return null
          var c = 0
          while (c < 3) {
            val v = (plte(3 * idx + c) & 0xFF).toLong
            row(3 * x + c) = plte(3 * idx + c)
            if (v < pMin) pMin = v
            if (v > pMax) pMax = v
            pSum += v; pSq += v * v
            c += 1
          }
          x += 1
        }
        crc.update(row)
        y += 1
      }
    } else {
      var k = 0
      while (k < surface.length) {
        val v = (surface(k) & 0xFFL)
        if (v < pMin) pMin = v
        if (v > pMax) pMax = v
        pSum += v; pSq += v * v
        k += 1
      }
      crc.update(surface)
    }
    InternalRow(width.toLong, height.toLong, colorType.toLong,
      palEntries.toLong, interlace == 1, passes.size.toLong,
      pMin, pMax, pSum, pSq, crc.getValue)
  }
}

/** png_full(content) -> struct<...> or null (see [[PngFull.decode]]). */
case class PngFullExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("color_type", LongType, nullable = false),
    StructField("palette_size", LongType, nullable = false),
    StructField("interlaced", BooleanType, nullable = false),
    StructField("n_passes", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_sqsum", LongType, nullable = false),
    StructField("px_crc32", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "png_full"
  override def nullSafeEval(v: Any): Any =
    PngFull.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.PngFull.decode($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
