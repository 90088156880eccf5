package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q330/q331 laws: the structural and pixel layers split exactly on the
  * planted corruptions, the LZW surface is bit-exact against the
  * generator intent, and truncation anywhere voids — never mis-decodes,
  * never crashes the scan. */
class GifSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(graft.Fixtures.path("gif"), name))

  test("layer split: rotten LZW passes the walk, voids the decode; " +
    "structural corruption voids both") {
    graft.functions.GifFunctions.register(spark)
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.gif")
      .load(graft.Fixtures.path("gif"))
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        expr("gif_info(content)").as("info"),
        expr("gif_pixels(content)").as("px"))
      .collect()
      .map(r => (r.getString(0), (!r.isNullAt(1), !r.isNullAt(2)))).toMap
    assert(rows.size == 9)
    rows.foreach { case (name, (infoOk, pxOk)) =>
      name match {
        case "corrupt_code.gif" =>
          assert(infoOk && !pxOk, s"$name: structure valid, LZW rotten")
        case "corrupt_trunc.gif" | "corrupt_trailer.gif" =>
          assert(!infoOk && !pxOk, s"$name must void both layers")
        case _ =>
          assert(infoOk && pxOk, s"$name must decode under both layers")
      }
    }
  }

  test("gif_reset.gif fills the dictionary: CLEAR resets observed") {
    val r = GifPixels.decode(fixture("gif_reset.gif"))
    assert(r != null)
    assert(r.getLong(3) >= 2L, // n_clears: initial + >=1 mid-stream reset
      s"reset fixture decoded with ${r.getLong(3)} clears")
  }

  test("truncation at every byte voids, never mis-decodes") {
    val good = fixture("gif_lct.gif")
    assert(GifPixels.decode(good) != null)
    var cut = 1
    while (cut < good.length) {
      assert(GifPixels.decode(java.util.Arrays.copyOf(good, cut)) == null,
        s"truncated at $cut must void")
      assert(GifInfo.decode(java.util.Arrays.copyOf(good, cut)) == null,
        s"walk truncated at $cut must void")
      cut += 1
    }
  }

  test("out-of-profile shapes void the decode, not the walk") {
    // interlace flag set: gif_info reports it, gif_pixels voids
    val g = fixture("gif_small87.gif")
    val idx = {
      var i = 13 + 3 * 4 // header + LSD + 4-entry GCT
      while ((g(i) & 0xFF) != 0x2C) i += 1
      i + 9
    }
    val inter = g.clone()
    inter(idx) = (inter(idx) | 0x40).toByte
    val info = GifInfo.decode(inter)
    assert(info != null && info.getLong(10) == 1L, "walk must count interlace")
    assert(GifPixels.decode(inter) == null, "interlace is out of decode profile")
  }
}
