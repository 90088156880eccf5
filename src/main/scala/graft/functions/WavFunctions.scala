package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** RIFF/WAVE header decode for q146 — the audio leg of the real-bytes
  * multimodal ingest story (PngFunctions is the image leg). Unlike PNG's
  * fixed-position IHDR, WAV metadata lives in a CHUNK LIST (`fmt ` and
  * `data` chunks after the 12-byte RIFF/WAVE preamble, each 8-byte
  * tagged+sized, word-aligned), so the decoder walks the list rather than
  * assuming the canonical layout — a fixture with a leading junk chunk
  * pins that. Little-endian fields, bounds-checked, null for anything
  * that is not a well-formed PCM WAV. */
object WavHeader {
  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t(0).toByte && b(o + 1) == t(1).toByte &&
      b(o + 2) == t(2).toByte && b(o + 3) == t(3).toByte

  /** struct(channels, sample_rate, bits_per_sample, n_frames) or null. */
  def fmt(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var pos = 12
    var channels = -1L; var rate = -1L; var bits = -1L; var block = -1L
    var dataBytes = -1L
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return null
      if (tag(b, pos, "fmt ") && size >= 16) {
        if (le16(b, pos + 8) != 1L) return null // PCM only
        channels = le16(b, pos + 10)
        rate = le32(b, pos + 12)
        block = le16(b, pos + 20)
        bits = le16(b, pos + 22)
      } else if (tag(b, pos, "data")) {
        dataBytes = size
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || block <= 0 ||
      dataBytes < 0) return null
    InternalRow(channels, rate, bits, dataBytes / block)
  }
}

/** wav_fmt(content) -> struct<channels, sample_rate, bits_per_sample,
  * n_frames: long>, null for non-WAV bytes. */
case class WavFmt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", LongType), StructField("sample_rate", LongType),
    StructField("bits_per_sample", LongType),
    StructField("n_frames", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "wav_fmt"

  override def nullSafeEval(v: Any): Any =
    WavHeader.fmt(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.WavHeader.fmt($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_fmt", exprs => WavFmt(exprs.head), "built-in")
}
