package graft.functions

import graft.SparkSpec

/** avi_hdr must walk the chunk list (fixtures plant JUNK before hdrl
  * and padding before avih) and refuse non-AVI bytes. */
class AviSpec extends SparkSpec {

  test("q206: header decode matches the generation manifest, null on junk") {
    val dir = graft.Fixtures.path("avi")
    val manifest = scala.io.Source.fromFile(s"$dir/manifest.csv")
      .getLines().drop(1).map { l =>
        val f = l.split(",")
        f(0) -> (f(1).toLong, f(2).toLong, f(3).toLong, f(4).toLong)
      }.toMap
    manifest.foreach { case (n, (us, fr, w, h)) =>
      val row = AviHeader.hdr(java.nio.file.Files
        .readAllBytes(java.nio.file.Paths.get(s"$dir/$n")))
      assert(row != null, s"$n must decode")
      assert((row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3)) == ((us, fr, w, h)), s"$n header mismatch")
    }
    // adversarial bytes: empty, text, RIFF-but-WAV, truncated RIFF/AVI
    val aviSig = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++
      "AVI ".getBytes
    for (junk <- Seq(
        Array.empty[Byte],
        "definitely not a video".getBytes("UTF-8"),
        "RIFF\u0004\u0000\u0000\u0000WAVE".getBytes("ISO-8859-1"),
        aviSig, // no hdrl at all
        aviSig ++ "LIST".getBytes ++ Array[Byte](127, 0, 0, 0) ++
          "hdrl".getBytes)) // LIST size past buffer end
      assert(AviHeader.hdr(junk) == null,
        s"malformed bytes must decode to null (${junk.length} bytes)")
  }

  test("q207: sampled frame hashes match the generator manifest bit-for-bit") {
    val dir = graft.Fixtures.path("avi_dedup")
    // (name, sample_idx) -> ahash, from the generator's own formula
    val manifest = scala.io.Source.fromFile(s"$dir/sample_hash.csv")
      .getLines().drop(1).map { l =>
        val f = l.split(",")
        (f(0), f(1).toLong) -> f(2).toLong
      }.toMap
    val names = manifest.keys.map(_._1).toSet
    assert(names.size == 8)
    names.foreach { n =>
      val arr = AviFrames.sampleAhash(java.nio.file.Files
        .readAllBytes(java.nio.file.Paths.get(s"$dir/$n")))
      assert(arr != null, s"$n must decode")
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getLong(0), r.getLong(1))
      }.toMap
      val expected = manifest.collect { case ((`n`, s), h) => s -> h }
      assert(got == expected, s"$n: scala sample hashes != generator")
    }
    // planted structure: re-encode matches on EVERY aligned sample,
    // unrelated clips on none (the q207 fraction threshold's two ends)
    def ham(a: String, b: String, s: Long) =
      java.lang.Long.bitCount(manifest((a, s)) ^ manifest((b, s)))
    val samples = (0L until 8L).map(_ * 3) // 24 frames, stride 3
    assert(samples.forall(s => ham("clip_a0.avi", "clip_a1.avi", s) <= 3))
    assert(samples.forall(s => ham("clip_b0.avi", "clip_b1.avi", s) <= 3))
    assert(samples.forall(s => ham("clip_a0.avi", "clip_b0.avi", s) > 3))
    assert(samples.forall(s => ham("clip_a0.avi", "solo_c.avi", s) > 3))
    // malformed: a frame payload that is not w*h bytes, and a header
    // whose total_frames disagrees with the movi chunk count → null
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/clip_a0.avi"))
    val truncatedFrame = good.clone()
    // shrink the first 00db chunk's declared size by 1 → not w*h
    val movi = {
      var i = 12
      var at = -1
      while (at < 0 && i + 8 <= truncatedFrame.length) {
        if (truncatedFrame(i) == '0' && truncatedFrame(i + 1) == '0' &&
            truncatedFrame(i + 2) == 'd' && truncatedFrame(i + 3) == 'b')
          at = i
        i += 1
      }
      at
    }
    assert(movi > 0)
    truncatedFrame(movi + 4) = (truncatedFrame(movi + 4) - 1).toByte
    assert(AviFrames.sampleAhash(truncatedFrame) == null,
      "frame payload != w*h must decode to null")
    assert(AviFrames.sampleAhash("not a video".getBytes) == null)
  }

  test("q210: full frame hashes match the generator manifest bit-for-bit") {
    val dir = graft.Fixtures.path("avi_dedup")
    val manifest = scala.io.Source.fromFile(s"$dir/frame_hash.csv")
      .getLines().drop(1).map { l =>
        val f = l.split(",")
        (f(0), f(1).toInt) -> f(2).toLong
      }.toMap
    val names = manifest.keys.map(_._1).toSet
    assert(names.size == 8 && names.contains("clip_a3_trim.avi"))
    names.foreach { n =>
      val arr = AviFrames.allAhash(java.nio.file.Files
        .readAllBytes(java.nio.file.Paths.get(s"$dir/$n")))
      assert(arr != null, s"$n must decode")
      val got = (0 until arr.numElements()).map(i => i -> arr.getLong(i)).toMap
      val expected = manifest.collect { case ((`n`, t), h) => t -> h }
      assert(got == expected, s"$n: scala frame hashes != generator")
    }
    assert(AviFrames.allAhash("not a video".getBytes) == null)
  }

  test("q207/q210 cross-certification: aligned leg misses the trim, " +
      "order-free leg catches exactly it") {
    // the complementarity the round-9 verdict asked for, pinned at query
    // level on the shared fixture dir: q207 (ordinal alignment) returns
    // exactly the four planted re-encode pairs and can never see the
    // trimmed re-upload; q210 (frame-hash-set MinHash) returns exactly
    // the trim pair — together they cover both dup families
    val aligned = graft.SparkEntry.queries("q207_video_dedup")(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(aligned == Set(
      ("clip_a0.avi", "clip_a1.avi"), ("clip_a0.avi", "clip_a2.avi"),
      ("clip_a1.avi", "clip_a2.avi"), ("clip_b0.avi", "clip_b1.avi")),
      s"q207 pairs drifted: $aligned")
    val orderFree = graft.SparkEntry.queries("q210_video_trim_dedup")(
      spark, sf0001).collect()
    assert(orderFree.length == 1)
    val r = orderFree.head
    assert((r.getString(0), r.getString(1)) ==
      (("clip_a0.avi", "clip_a3_trim.avi")))
    assert(r.getLong(2) == 20L && r.getLong(3) == 24L && r.getLong(4) == 20L,
      "trim pair must share exactly the 20 surviving frames")
  }
}
