package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Real-bytes VIDEO ingest (q206): decode the AVI main header from a
  * `binary` column — the video leg of the multimodal family next to
  * png_ihdr (image) and wav_fmt (audio). AVI is a RIFF container (the
  * same envelope as WAV), so this is one bounds-checked chunk walk: the
  * outer RIFF/`AVI ` signature, a LIST(`hdrl`) found by walking the
  * top-level chunks (never assumed at a fixed offset — fixtures plant
  * JUNK before it), and the `avih` chunk inside it (again walked —
  * fixtures plant padding first), whose little-endian fields carry
  * microseconds-per-frame, total frames, width, height. Anything
  * malformed decodes to null, never garbage — the DROPMALFORMED
  * discipline of every decoder in the repo. The CODEC payload is out of
  * scope by design (the container has no codecs; SURVEY's multimodal
  * stance): header metadata + frame-sample planning are the real
  * Spark-side plumbing, the per-frame decode is the one stubbed step.
  */
object AviHeader {
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t(0).toByte && b(o + 1) == t(1).toByte &&
      b(o + 2) == t(2).toByte && b(o + 3) == t(3).toByte

  /** struct(us_per_frame, total_frames, width, height) or null. */
  def hdr(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return null
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return null
      if (tag(b, pos, "LIST") && size >= 4 &&
          tag(b, pos + 8, "hdrl")) {
        // walk the hdrl list body for the avih chunk
        var ip = pos + 12
        val end = pos + 8 + size.toInt
        while (ip + 8 <= end) {
          val isize = le32(b, ip + 4)
          if (isize < 0 || ip + 8 + isize > end) return null
          if (tag(b, ip, "avih") && isize >= 40) {
            val o = ip + 8
            val us = le32(b, o)
            val frames = le32(b, o + 16)
            val w = le32(b, o + 32)
            val h = le32(b, o + 36)
            // frames == 0 rejected too: a zero-frame header would make
            // downstream sequence(0, total_frames - 1) step backwards
            // and emit bogus sample rows; malformed ⇒ null, like the rest.
            if (us <= 0 || frames <= 0 || w <= 0 || h <= 0) return null
            return InternalRow(us, frames, w, h)
          }
          ip += 8 + isize.toInt + (isize.toInt & 1) // word-aligned
        }
        return null // hdrl without avih
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    null
  }
}

/** avi_hdr(content) -> struct<us_per_frame, total_frames, width,
  * height: long>, null for non-AVI bytes. */
case class AviHdr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("us_per_frame", LongType),
    StructField("total_frames", LongType),
    StructField("width", LongType), StructField("height", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "avi_hdr"

  override def nullSafeEval(v: Any): Any =
    AviHeader.hdr(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.AviHeader.hdr($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avi_hdr", exprs => AviHdr(exprs.head), "built-in")
}
