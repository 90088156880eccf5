package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q174's custom physical operator: planned shape, streaming-merge
  * equality with the composed q16, and the operator's own contract on
  * adversarial inputs.
  */
class AsOfJoinSpec extends SparkSpec {

  test("q174: plan uses AsOfJoinExec over co-partitioned sorted children — no window, no join") {
    val df = graft.SparkEntry.queries("q174_asof_exec")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"the custom operator must not fall back to the window form:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no standard join may implement the as-of:\n$plan")
    // Catalyst supplied the physical prerequisites the exec declared:
    // hash exchanges on user_id and (key, ts) sorts on both children
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).length >= 2,
      s"both children must hash-partition on the key:\n$plan")
    assert(plan.contains("Sort ["), s"children must be sorted:\n$plan")
  }

  test("q174: equals the composed union+window q16 row-for-row") {
    val composed = graft.SparkEntry.queries("q16_asof_join")(spark, sf0001)
      .collect().toSeq
    val exec = graft.SparkEntry.queries("q174_asof_exec")(spark, sf0001)
      .collect().toSeq
    assert(exec == composed)
    assert(exec.exists(_.isNullAt(2)),
      "corpus must contain purchases with no prior click or the " +
        "null path is untested")
  }

  test("asof operator contract: ties match, later rows don't, empty right side") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "l_us", "p")
    val right = Seq((1L, 100L, 7L), (1L, 150L, 8L), (1L, 201L, 9L))
      .toDF("k", "r_us", "c")
    val out = AsOfJoin.asof(left, right, "k", "l_us", "r_us")
      .orderBy("k", "l_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 100L, 10L, 100L, 7L), // tie on ts matches
      (1L, 200L, 11L, 150L, 8L), // 201 is later: held back
      (2L, 50L, 12L, -1L, -1L))) // key with no right rows: nulls
  }
}
