package graft.sources

import graft.SparkSpec

/** q132: the bucketed join's entire point is the exchange it does NOT
  * have — both sides read pre-bucketed on the join key, so no shuffle
  * feeds the join; the only exchange in the whole plan is the final
  * tiny groupBy (and its distinct-count expansion).
  */
class BucketedStageSpec extends SparkSpec {

  test("q132: bucketed sides join with zero exchanges before the join") {
    val df = BucketedStage.queries("q132_bucketed_join")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"co-located join expected:\n$p")
    // the join inputs are bucketed scans: the ONLY hash exchanges allowed
    // are the aggregation's (countDistinct plans partial pairs over
    // (mktsegment, custkey) then (mktsegment)) — both AFTER the join.
    // Structural form: no Exchange may appear between a FileScan and the
    // join node, which in toString terms means every Exchange line sits
    // above the SortMergeJoin line.
    val lines = p.linesIterator.toVector
    val joinLine = lines.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    val exchBelowJoin = lines.drop(joinLine + 1)
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchBelowJoin == 0,
      s"no exchange may feed the bucketed join:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"scan must report bucket pruning/selection metadata:\n$p")
    assert(df.collect().length == 5, "five market segments")
  }
}
