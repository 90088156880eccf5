package graft.operators

import graft.SparkSpec

/** q259's Mann-Whitney AUC harness must be PROVABLY exact even though
  * the suite corpus scores ≈ 0.507 (md5-random weights carry no signal
  * — the measured verdict the query's scaladoc documents): engineered
  * label/score frames pin the three regimes the statistic has —
  * perfect separation, pure ties, and a hand-computed tie mix — and a
  * cross-bucket case proves the 1024-bucket decomposition (broadcast
  * prefix + per-bucket window) agrees with the single-bucket path. */
class AucSpec extends SparkSpec {

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = TextAnalysis.aucOn(rows.toDF("score", "label")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("perfect separation => AUC = 1") {
    val (np, nn, p2, a) = auc(Seq((10L, false), (20L, false),
      (30L, true), (40L, true)))
    assert((np, nn) == (2L, 2L))
    assert(p2 == 2L * np * nn) // every pos beats every neg, no ties
    assert(a == 1000000L)
  }

  test("perfectly inverted => AUC = 0") {
    val (_, _, p2, a) = auc(Seq((30L, true), (40L, true),
      (50L, false), (60L, false)))
    assert(p2 == 0L && a == 0L)
  }

  test("all scores tied => AUC = exactly 1/2") {
    val (np, nn, p2, a) = auc(Seq((7L, true), (7L, true),
      (7L, false), (7L, false), (7L, false)))
    assert((np, nn) == (2L, 3L))
    assert(p2 == np * nn) // every pair is a tie, counted once
    assert(a == 500000L)
  }

  test("hand-computed tie mix => AUC = 3/4") {
    // pos@1 ties neg@1 (1/2), pos@2 beats neg@1 (1): AUC = 1.5/2
    val (np, nn, p2, a) = auc(Seq((1L, true), (1L, false), (2L, true)))
    assert((np, nn) == (2L, 1L))
    assert(p2 == 3L)
    assert(a == 750000L)
  }

  test("scores spanning quantization buckets: decomposition is exact") {
    // same rank structure as the tie mix but with the winning positive
    // pushed two buckets up — nbb (cross-bucket self-join prefix) must
    // carry the negative's count into the high bucket
    val w = TextAnalysis.AucBucketW
    val (np, nn, p2, a) = auc(Seq((1L, true), (1L, false),
      (2L * w + 5L, true)))
    assert((np, nn) == (2L, 1L))
    assert(p2 == 3L)
    assert(a == 750000L)
  }
}
