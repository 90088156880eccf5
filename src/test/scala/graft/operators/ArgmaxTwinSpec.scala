package graft.operators

import graft.SparkSpec

/** q182 (BIGINT-pack argmax, pack_ok-gated) and q211 (struct-ordering
  * argmax, unbounded) must be the SAME function wherever the pack is
  * valid — the cross-certification the round-9 verdict asked for. */
class ArgmaxTwinSpec extends SparkSpec {

  private def rows(name: String, d: String) =
    graft.SparkEntry.queries(name)(spark, d).collect()

  test("q211 equals q182 on shared columns at fixture SFs, pack_ok true") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val packed = rows("q182_argmax", d)
      val structed = rows("q211_argmax_struct", d)
      assert(packed.nonEmpty && packed.length == structed.length)
      // the twin contract only holds while the pack is a total order —
      // q182's own gate must be green at these SFs
      packed.foreach(r => assert(r.getBoolean(6),
        s"pack_ok false at $d — the pack domain assumption broke"))
      // shared columns (flag, max_order, min_order, max_pc, min_pc, n)
      // must be identical row for row
      val p = packed.map(r => (0 to 5).map(r.get))
      val t = structed.map(r => (0 to 5).map(r.get))
      assert(p.toSeq == t.toSeq,
        s"pack and struct argmax diverged at $d:\n${p.zip(t).mkString("\n")}")
    }
  }

  test("the struct order survives tails the pack cannot represent") {
    // a synthetic frame where tail >= 1e9 (orderkey past the pack's
    // ~1e6 bound): the pack overflows into the pc slot and votes for
    // the WRONG row; the struct key stays correct — the exact failure
    // q182's pack_ok gate exists to catch and q211 exists to survive
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val big = Seq(
      // (flag, orderkey, linenumber, pc): low pc on a HUGE orderkey,
      // high pc on a small one — the pack's overflow inverts them
      ("A", 2000000000L, 1L, 10L),
      ("A", 5L, 1L, 999L)).toDF("flag", "ok", "ln", "pc")
      .withColumn("tail", col("ok") * 1000L + col("ln"))
    val structed = big.groupBy(col("flag"))
      .agg(expr("max_by(ok, struct(pc, tail))").as("mx"))
      .collect().head.getLong(1)
    val packed = big
      .withColumn("ord", col("pc") * 1000000000L + col("tail"))
      .groupBy(col("flag"))
      .agg(expr("max_by(ok, ord)").as("mx"))
      .collect().head.getLong(1)
    assert(structed == 5L, "struct order must pick the max-pc row")
    assert(packed == 2000000000L,
      "the pack demonstrably inverts on overflow (why the twin exists)")
  }
}
