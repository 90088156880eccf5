package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q128 PageRank: the distributed iteration must equal an independent
  * in-memory model exactly (integer arithmetic ⇒ bit-equality, not
  * tolerance), and the plan must stay declarative (no eager driver
  * actions inside the loop).
  */
class GraphSpec extends SparkSpec {

  test("q128 pagerank equals an in-memory integer model bit-for-bit") {
    val li = graft.Tables.t(spark, sf0001, "lineitem")
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    var r: Map[Long, Long] = deg.map { case (v, _) => v -> Graph.Base / n }
    for (_ <- 1 to Graph.Iters) {
      val sums = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      r.foreach { case (u, ru) =>
        val c = ru / deg(u)
        nbrs(u).foreach(v => sums(v) += c)
      }
      r = deg.map { case (v, _) =>
        v -> ((15L * Graph.Base) / (100L * n) + (85L * sums(v)) / 100L)
      }
    }
    val expectedTop = r.toSeq.map { case (v, rv) => (rv, v) }
      .sortBy { case (rv, v) => (-rv, v) }.take(Graph.TopK)
      .map { case (rv, v) => (v, rv) }
    val got = Graph.queries("q128_pagerank")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(3)))
    assert(got.toSeq == expectedTop,
      s"distributed != in-memory model:\n got=${got.toSeq}\n exp=$expectedTop")
    // sanity on the model itself: floor losses are the only mass leak
    val total = r.values.sum
    assert(total <= Graph.Base && total > (Graph.Base * 9) / 10,
      s"rank mass $total escaped the [0.9·Base, Base] envelope")
  }

  test("q128 persists register with CacheRegistry; release() drains them") {
    graft.CacheRegistry.release(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.queries("q128_pagerank")(spark, sf0001).collect()
    assert(graft.CacheRegistry.size(spark) >= 2,
      "edges + deg must route through the shared registry")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "materialization must actually cache blocks")
    graft.CacheRegistry.release(spark)
    assert(graft.CacheRegistry.size(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "no MEMORY_AND_DISK entries may survive release()")
  }

  test("q128 plan: ranks/edges meet on equi-joins; top-k is TakeOrdered") {
    val p = Graph.queries("q128_pagerank")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "only the 1-row n frame may broadcast-nest; node joins must be equi")
    assert(p.contains("TakeOrderedAndProject"),
      s"final top-k must not global-sort:\n$p")
  }
}
