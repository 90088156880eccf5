package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Z-order (Morton) layout key — the multi-dimensional clustering
  * operator behind "one layout serves filters on EITHER dimension"
  * (ScaleTechniquesSpec proves the row-group pruning with executed scan
  * metrics on z-sorted vs linearly-sorted parquet; THIS query makes the
  * key itself a first-class, oracle-exact operator the way q105 promoted
  * the staged dedup). The reference has no layout surface at all — its
  * scan is always the full file (`main.rs:79-122`); this is
  * capability-envelope coverage for the 100 TB tier, where data layout
  * IS the query optimizer's strongest lever.
  *
  * The interleave is pure bit arithmetic (`& | <<` only — no xor, whose
  * operator DuckDB assigns to exponentiation), generated ONCE as SQL
  * text and shared verbatim by the Spark plan and the DuckDB oracle, so
  * the engines execute the identical expression tree: the classic
  * 16-bit→32-bit magic-number spread
  * (x|x<<8 & 0x00FF00FF, …<<4 & 0x0F0F0F0F, …<<2 & 0x33333333,
  * …<<1 & 0x55555555), then z = spread(x) | spread(y)<<1.
  *
  * Output: per z-bucket (top 5 bits → ≤32 buckets) row counts and
  * min/max of BOTH dimensions — the bounded-box-per-bucket property that
  * makes row-group statistics prune either predicate. Everything is
  * integer, so the hash compare is exact.
  *
  * Scale notes: the key is a scalar projection — embarrassingly parallel,
  * whole-stage-codegen'd, no shuffle of its own; the one shuffle in a
  * real deployment is the final repartitionByRange(z) before the sorted
  * write (demonstrated in the spec). Dimensions are masked to 16 bits
  * explicitly; wider domains first quantile-bucket each dimension to
  * 2^16 ranks (the q123 cutoff machinery), which also equalizes skewed
  * dimensions — documented here, not needed for these key domains.
  */
object Layout {

  /** 16-bit→32-bit bit spread + interleave, as engine-neutral SQL. */
  def mortonSql(x: String, y: String): String = {
    def spread(v: String): String = {
      val m = s"($v & 65535)"
      val a = s"(($m | ($m << 8)) & 16711935)"
      val b = s"(($a | ($a << 4)) & 252645135)"
      val c = s"(($b | ($b << 2)) & 858993459)"
      s"(($c | ($c << 1)) & 1431655765)"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_zorder_key" -> ((s, d) => {
      // dimensions are rescaled to the FULL 16-bit range first — raw keys
      // occupy only the low bits, which would collapse every row into one
      // z-bucket. The per-dim max rides in as a lazy 1-row crossJoin (the
      // q85/q38 idiom — never an eager driver action); the rescale is
      // integer `div` on non-negative values, exact in both engines.
      val mm = t(s, d, "lineitem")
        .agg(max(col("l_partkey")).as("pmax"), max(col("l_suppkey")).as("smax"))
      t(s, d, "lineitem").crossJoin(mm)
        .selectExpr("l_partkey", "l_suppkey",
          s"${mortonSql("(l_partkey * 65535) div pmax",
            "(l_suppkey * 65535) div smax")} AS z")
        .selectExpr("CAST(z >> 27 AS BIGINT) AS bucket",
          "l_partkey", "l_suppkey")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
        .orderBy("bucket")
    })
  )

  val oracle: Map[String, String] = Map(
    "q141_zorder_key" ->
      s"""SELECT CAST(z >> 27 AS BIGINT) AS bucket, count(*) AS n,
         |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
         |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
         |FROM (SELECT l_partkey, l_suppkey,
         |        ${mortonSql("(l_partkey * 65535) // pmax",
               "(l_suppkey * 65535) // smax")} AS z
         |      FROM lineitem,
         |        (SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax
         |         FROM lineitem))
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
