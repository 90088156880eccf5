package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins the CacheRegistry byte-budget mechanics (round-13 item #7: the
  * round-12 bench diag showed registered storage growing monotonically to
  * ~181 MB over the suite). The budget itself is a fixed 128 MB; the spec
  * shrinks it against four materialized frames of known size to prove the
  * policy — oldest evicted first, newest kept, post-enforce registered
  * storage under budget — then restores the default so sibling suites run
  * untouched.
  */
class CacheBudgetSpec extends SparkSpec {

  private def frame(salt: Int) =
    spark.range(200000L + salt)
      .select(col("id"), md5(concat(lit(salt), col("id"))).as("h"),
        md5(concat(lit(salt * 7), col("id"))).as("h2"))

  test("default budget is the documented 128 MB") {
    assert(CacheRegistry.budgetBytes == 128L * 1024 * 1024)
  }

  test("enforce evicts oldest-first until registered storage is under budget") {
    val prior = CacheRegistry.budgetBytes
    try {
      // isolate the meter: registered storage counts ONLY registered
      // frames, so clearing the registry gives a zero baseline (evicted
      // sibling-suite frames just recompute on next use)
      CacheRegistry.release(spark)
      assert(CacheRegistry.storageBytes(spark) == 0L)

      val fs = (1 to 4).map(i => CacheRegistry.cached(frame(i)))
      fs.foreach(_.count()) // materialize
      val total = CacheRegistry.storageBytes(spark)
      assert(total > 0L, "four materialized frames must meter above zero")
      assert(CacheRegistry.size(spark) == 4)

      // generous budget: no-op
      CacheRegistry.budgetBytes = total + 1
      assert(CacheRegistry.enforce(spark) == 0)
      assert(CacheRegistry.size(spark) == 4)

      // budget just below total: exactly the OLDEST frame (f1) must go —
      // frames are near-equal sized, so total − f1/2 readmits f2+f3+f4
      val f1Bytes = total / 4
      CacheRegistry.budgetBytes = total - f1Bytes / 2
      val evicted = CacheRegistry.enforce(spark)
      assert(evicted == 1, s"expected exactly the oldest evicted, got $evicted")
      assert(CacheRegistry.size(spark) == 3)
      assert(CacheRegistry.storageBytes(spark) <= CacheRegistry.budgetBytes)
      assert(fs.head.storageLevel == StorageLevel.NONE,
        "the oldest-registered frame must be the one unpersisted")
      assert(fs.last.storageLevel != StorageLevel.NONE,
        "the newest-registered frame must survive")

      // shrink hard: everything must go, meter returns to zero
      CacheRegistry.budgetBytes = 0L
      assert(CacheRegistry.enforce(spark) == 3)
      assert(CacheRegistry.size(spark) == 0)
      assert(CacheRegistry.storageBytes(spark) == 0L)
    } finally {
      CacheRegistry.budgetBytes = prior
    }
  }
}
