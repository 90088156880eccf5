package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinRuleSpec extends AnyFunSuite {

  private def freshSession(withRule: Boolean): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    val s = (if (withRule) b.withExtensions(new graft.GraftExtensions) else b)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def restoreShared(): Unit = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    graft.SparkSpec.session
  }

  private def sides(s: SparkSession) = {
    val ev = graft.Tables.events(s, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    (ev.select(col("user_id").as("ua"), col("event_id").as("i"),
        col("us").as("us_i")),
      ev.select(col("user_id").as("ub"), col("event_id").as("j"),
        col("us").as("us_j")))
  }

  test("pure range join: nested-loop without the rule, equi-join with it") {
    // no equi conjunct at all — Spark's only native plan is O(n*m)
    def pureRange(s: SparkSession) = {
      val (a, b) = sides(s)
      a.join(b, col("i") < col("j") &&
          abs(col("us_j") - col("us_i")) <= lit(120000000L))
        .select(col("i"), col("j"), (col("us_j") - col("us_i")).as("dt_us"))
    }
    val plain = freshSession(withRule = false)
    val (naivePlan, expected) = try {
      val df = pureRange(plain)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(_.toString).sorted.toSeq)
    } finally restoreShared()
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))

    val ruled = freshSession(withRule = true)
    try {
      val df = pureRange(ruled)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule should produce an equi-join, got:\n$plan")
      assert(plan.contains("graft_bin"), "banded helper columns in the plan")
      assert(df.collect().map(_.toString).sorted.toSeq == expected)
    } finally restoreShared()
  }

  test("equi+range join: bin key added beside the equi key, result unchanged") {
    // with an equi key Spark hash-joins already, but every same-key pair is
    // compared; the bin key bounds per-key work to same/adjacent-bin pairs
    def userRange(s: SparkSession) = {
      val (a, b) = sides(s)
      a.join(b, col("ua") === col("ub") && col("i") < col("j") &&
          abs(col("us_j") - col("us_i")) <= lit(120000000L))
        .select(col("ua").as("user_id"), col("i"), col("j"),
          (col("us_j") - col("us_i")).as("dt_us"))
    }
    val plain = freshSession(withRule = false)
    val expected = try userRange(plain).collect().map(_.toString).sorted.toSeq
      finally restoreShared()

    val ruled = freshSession(withRule = true)
    try {
      val df = userRange(ruled)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_bin"), s"bin key expected in join:\n$plan")
      assert(df.collect().map(_.toString).sorted.toSeq == expected)
      // agrees with the hand-banded q17 formulation
      val manual = graft.SparkEntry.queries("q17_range_join")(
        ruled, "/root/testdata/sf0.001")
        .select("user_id", "i", "j", "dt_us")
        .collect().map(_.toString).sorted.toSeq
      assert(df.collect().map(_.toString).sorted.toSeq == manual)
    } finally restoreShared()
  }

  test("q177: the runtime-installed rule bands the production query — no nested loop") {
    val s = graft.SparkSpec.session
    val df = graft.SparkEntry.queries("q177_range_rule")(
      s, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin"),
      s"RangeJoinRule must have banded the naive join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the rewritten plan must not nested-loop:\n$plan")
    val got = df.collect().map(_.toString).toSeq
    val manual = graft.SparkEntry.queries("q17_range_join")(
      s, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
    assert(got == manual, "rule-banded and hand-banded answers must match")
  }

  private def generateCount(
      df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.size

  test("q177 leaves the shared session's optimizer untouched (round-7 #1)") {
    val s = graft.SparkSpec.session
    val before = s.experimental.extraOptimizations
    graft.SparkEntry.queries("q177_range_rule")(s, sfDir).collect()
    assert(s.experimental.extraOptimizations == before,
      "q177 must install RangeJoinRule on its own session clone, " +
        "never the caller's session")
    assert(!s.experimental.extraOptimizations.contains(
      graft.plans.RangeJoinRule))
  }

  test("q17 after q177, same session: exactly one explode/bin layer") {
    // the round-7 regression: once q177 had run, q17's hand-binned join
    // was banded a SECOND time by the leaked rule. Both fixes pin here —
    // the session-clone install AND the structural fixpoint guard.
    val s = graft.SparkSpec.session
    val e177 = graft.SparkEntry.queries("q177_range_rule")(s, sfDir)
    val q17 = graft.SparkEntry.queries("q17_range_join")(s, sfDir)
    assert(generateCount(q17) == 1,
      s"q17 must keep its single hand-binned explode after q177 ran:\n" +
        q17.queryExecution.optimizedPlan)
    assert(q17.collect().map(_.toString).toSeq ==
      e177.collect().map(_.toString).toSeq)
  }

  test("structural guard: rule on a hand-binned plan is a no-op") {
    // even with the rule installed GLOBALLY (extensions session), the
    // hand-binned q17 shape must not be re-banded: the guard recognizes
    // the {b-1, b, b+1} Generate + bin equi-conjunct structurally, not
    // by the rule's own column names.
    val ruled = freshSession(withRule = true)
    try {
      val q17 = graft.SparkEntry.queries("q17_range_join")(ruled, sfDir)
      assert(generateCount(q17) == 1,
        s"rule-carrying session re-banded the hand-binned join:\n" +
          q17.queryExecution.optimizedPlan)
    } finally restoreShared()
  }

  private val sfDir = "/root/testdata/sf0.001"
}
