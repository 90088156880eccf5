package graft.operators

import graft.SparkSpec

/** q238 (absmax int8 dot vs float-cosine top-10) and q239 (its
  * L2-normalize-first twin) exist as a measurement PAIR: q238's
  * depressed recall is the finding that magnitude leaks into an
  * unnormalized dot ranking, q239 is the production fix. This spec
  * pins the relationship so neither query can silently drift into
  * contradicting the story the suite documents.
  */
class Int8RecallSpec extends SparkSpec {

  private def overlaps(name: String, d: String): Map[Long, Long] =
    graft.SparkEntry.queries(name)(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("normalize-before-quantize never loses to raw absmax, per query") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val raw = overlaps("q238_int8_recall", d)
      val norm = overlaps("q239_int8_norm_recall", d)
      assert(raw.keySet == norm.keySet && raw.nonEmpty)
      raw.foreach { case (q, r) =>
        assert(norm(q) >= r,
          s"q239 overlap ${norm(q)} < q238 overlap $r for query $q at $d " +
            "— normalization made int8 ranking WORSE, the twin claim broke")
      }
    }
  }

  test("normalized int8 recall@10 is perfect on the fixture corpus") {
    // on unit vectors the int8 dot differs from cosine only by
    // quantization noise; at Dim=64 / 8-bit that noise never reorders
    // this corpus's top-10 — the measured fact the README row quotes
    val norm = overlaps("q239_int8_norm_recall", "/root/testdata/sf0.01")
    assert(norm.values.forall(_ == 10L),
      s"q239 recall@10 no longer perfect at sf0.01: $norm")
  }
}
