package graft

import org.apache.spark.sql.functions._

/** The storage-layout techniques that matter at 100 TB, proven on the plan:
  * bucketing removes the shuffle from a fact-fact join entirely, and
  * partitioned layout + partition pruning turns a full scan into a
  * directory-subset scan. These are layout decisions, not query decisions —
  * exactly the knobs a 1000-executor deployment turns first.
  */
class ScaleTechniquesSpec extends SparkSpec {

  private lazy val wh = java.nio.file.Files
    .createTempDirectory("graft_wh").toString

  test("bucketed tables join with zero Exchange in the plan") {
    val s = spark // warehouse dir set to a temp dir in SparkSpec (static conf)
    val li = s.read.parquet(s"$sf0001/lineitem.parquet")
    val o = s.read.parquet(s"$sf0001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // disable broadcast so the join would otherwise need a shuffle
    val prior = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        "bucketed-by-join-key tables must co-locate: no shuffle allowed")
      // and the answer is still right
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == direct)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("partitioned parquet layout prunes partitions under a filter") {
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$wh/events_parted")
    val scan = spark.read.parquet(s"$wh/events_parted")
      .filter(col("event_type") === "purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "event_type filter must prune at the directory level, not post-scan")
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(scan.count() == expected)
  }

  test("ORC and JSON sources agree with parquet (cross-format parity)") {
    val gen = graft.onebrc.OneBrc.generate(spark, 20000L)
    gen.write.mode("overwrite").orc(s"$wh/m_orc")
    gen.write.mode("overwrite").json(s"$wh/m_json")
    val fromOrc = graft.onebrc.OneBrc.brcAgg(
      spark.read.orc(s"$wh/m_orc")).collect().toSeq
    val fromJson = graft.onebrc.OneBrc.brcAgg(
      spark.read.schema(graft.onebrc.OneBrc.schema).json(s"$wh/m_json"))
      .collect().toSeq
    assert(fromOrc == fromJson)
    assert(fromOrc == graft.onebrc.OneBrc.brcAgg(gen).collect().toSeq)
  }
}
