package graft.operators

import graft.SparkSpec

/** q225's output must be a true PERMUTATION per epoch (positions are a
  * bijection over the corpus — a gap or dup means a training step would
  * skip or repeat a sample) and genuinely different across epochs. */
class EpochShuffleSpec extends SparkSpec {

  test("each epoch is a bijection over the corpus; epochs differ") {
    val rows = graft.SparkEntry.queries("q225_epoch_shuffle")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    val docSets = byEpoch.map { case (e, rs) =>
      // positions are exactly 1..n with no gaps or duplicates
      val pos = rs.map(_._2).sorted.toSeq
      assert(pos == (1L to rs.length.toLong),
        s"epoch $e positions are not a bijection")
      e -> rs.map(_._3).toSet
    }
    // both epochs cover the identical corpus
    assert(docSets(0L) == docSets(1L))
    // and the ORDERS differ (md5 salting by epoch): some doc moved
    val p0 = byEpoch(0L).map(r => r._3 -> r._2).toMap
    val p1 = byEpoch(1L).map(r => r._3 -> r._2).toMap
    assert(p0.exists { case (doc, pos) => p1(doc) != pos },
      "epoch permutations are identical — the salt is not epoch-dependent")
  }
}
