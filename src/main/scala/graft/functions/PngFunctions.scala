package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Real-bytes decode for the multimodal ingest story (q144): extract the
  * IHDR header fields from a PNG `binary` column in one bounds-checked
  * pass over the first 26 bytes — no imaging library, no UDF, a codegen
  * Catalyst expression like every other custom function in the repo. The
  * PNG wire format is public and fixed: 8-byte signature, then the IHDR
  * chunk (4-byte length=13, 4-byte tag, 4-byte big-endian width, 4-byte
  * big-endian height, 1-byte bit depth, 1-byte color type). Anything that
  * fails the signature/tag/length checks decodes to null, never garbage —
  * the DROPMALFORMED discipline of the 1BRC parsers applied to binary.
  */
object PngHeader {
  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** struct(width, height, bit_depth, color_type) or null when the bytes
    * are not a PNG (short buffer, bad signature, IHDR not first or not
    * 13 bytes — the spec-mandated layout). */
  def ihdr(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 26) return null
    var i = 0
    while (i < 8) { if (b(i) != Sig(i)) return null; i += 1 }
    if (be32(b, 8) != 13L) return null
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    InternalRow(be32(b, 16), be32(b, 20),
      (b(24) & 0xFF).toLong, (b(25) & 0xFF).toLong)
  }
}

/** png_ihdr(content) -> struct<width, height, bit_depth, color_type: long>,
  * null for non-PNG bytes. */
case class PngIhdr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("bit_depth", LongType), StructField("color_type", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "png_ihdr"

  override def nullSafeEval(v: Any): Any =
    PngHeader.ihdr(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.PngHeader.ihdr($b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "png_ihdr", exprs => PngIhdr(exprs.head), "built-in")
}
