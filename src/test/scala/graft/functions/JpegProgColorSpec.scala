package graft.functions

import graft.SparkSpec

/** q332's laws: the four-way JPEG profile split (baseline/progressive ×
  * gray/color) holds in every direction, the baseline color twin lands
  * the identical RGB CRC through the other entropy layer, and
  * truncation anywhere voids. */
class JpegProgColorSpec extends SparkSpec {

  private def fx(dir: String, name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(graft.Fixtures.path(dir), name))

  test("four-way profile split: each decoder accepts exactly its own") {
    val progColor = fx("jpeg_prog_color", "prog_color_multi.jpg")
    val baseColor = fx("jpeg_color", "color_multi.jpg")
    val progGray = fx("jpeg_prog", "prog_multi.jpg")
    val baseGray = fx("jpeg_decode", "gray_multi.jpg")
    // rows: (bytes, expected-accepting decoder index)
    val decoders: Seq[(String, Array[Byte] => AnyRef)] = Seq(
      "jpeg_pixels" -> (b => JpegPixels.decode(b)),
      "jpeg_rgb" -> (b => JpegRgb.decode(b)),
      "jpeg_prog_pixels" -> (b => JpegProg.decode(b)),
      "jpeg_prog_rgb" -> (b => JpegProgColor.decode(b)))
    val files = Seq(
      ("baseline gray", baseGray, "jpeg_pixels"),
      ("baseline color", baseColor, "jpeg_rgb"),
      ("progressive gray", progGray, "jpeg_prog_pixels"),
      ("progressive color", progColor, "jpeg_prog_rgb"))
    files.foreach { case (label, bytes, accepts) =>
      decoders.foreach { case (dn, dec) =>
        val got = dec(bytes)
        if (dn == accepts)
          assert(got != null, s"$label must decode under $dn")
        else
          assert(got == null, s"$label must VOID under $dn")
      }
    }
  }

  test("baseline color twin: two entropy layers, one RGB surface") {
    val prog = JpegProgColor.decode(fx("jpeg_prog_color", "prog_color_twin.jpg"))
    val base = JpegRgb.decode(fx("jpeg_prog_color", "twin_base_color.jpg"))
    assert(prog != null && base != null)
    (0 until 9).foreach { f =>
      assert(prog.getLong(f) == base.getLong(f),
        s"twin field $f: progressive ${prog.getLong(f)} != baseline ${base.getLong(f)}")
    }
  }

  test("truncation at every byte voids, never mis-decodes") {
    val good = fx("jpeg_prog_color", "prog_color_small.jpg")
    assert(JpegProgColor.decode(good) != null)
    var cut = 2
    while (cut < good.length) {
      assert(JpegProgColor.decode(java.util.Arrays.copyOf(good, cut)) == null,
        s"truncated at $cut must void")
      cut += 1
    }
    assert(JpegProgColor.decode(fx("jpeg_prog_color", "corrupt_truncated.jpg")) == null)
  }
}
