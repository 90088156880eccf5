package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-keyed registry of every frame the library persists.
  *
  * Spark's CacheManager dedupes persisted entries by plan identity but
  * never drops them, so a long-lived driver would otherwise accumulate one
  * MEMORY_AND_DISK entry per corpus per query family for the life of the
  * session (the round-4 Dedup leak, and round 5's Graph.scala repeat).
  * Every module that persists ([[graft.operators.Dedup]],
  * [[graft.operators.Graph]]) routes through [[cached]]; [[release]] is
  * the shared cache-lifecycle hook — call it when done with a corpus (or
  * after rewriting one in-session). Over-releasing a sibling corpus's
  * frames in the same session only costs a recompute on next use, never
  * correctness.
  */
object CacheRegistry {

  private val registry =
    scala.collection.concurrent.TrieMap.empty[SparkSession, List[DataFrame]]

  /** persist + record for release. One list entry per CONSTRUCTION (cheap;
    * unpersist is idempotent on plan-deduped entries), and entries pinned
    * to stopped sessions are evicted opportunistically. */
  def cached(df: DataFrame): DataFrame = {
    registry.keys.filter(_.sparkContext.isStopped).foreach(registry.remove)
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registry.synchronized {
      val s = df.sparkSession
      registry(s) = p :: registry.getOrElse(s, Nil)
    }
    p
  }

  /** Unpersist and forget every frame registered for `s`. */
  def release(s: SparkSession): Unit =
    registry.remove(s).foreach(_.foreach(_.unpersist()))

  /** Number of frames currently registered for `s` (spec probe). */
  def size(s: SparkSession): Int = registry.get(s).map(_.size).getOrElse(0)
}
