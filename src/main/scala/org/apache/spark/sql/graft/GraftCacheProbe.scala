package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset

/** Second `org.apache.spark.sql`-namespace shim (same pattern as
  * [[GraftSqlShim]]): `CacheManager.lookupCachedData` and the
  * `InMemoryRelation.cacheBuilder` internals are `private[sql]`, and
  * [[graft.CacheRegistry]]'s byte-budget eviction needs to know which
  * block-manager RDD a registered frame's cache entry occupies so it can
  * meter REGISTERED storage only (localCheckpoint blocks and other
  * persists are not the registry's to evict). Read-only probing, nothing
  * else.
  */
object GraftCacheProbe {

  /** Block-manager RDD id of `df`'s cache buffers, if the frame has a
    * cache entry whose buffers RDD already exists (i.e. something was
    * materialized or at least planned against the cache). None for
    * never-cached / already-unpersisted frames — and deliberately does
    * NOT force buffer creation on a cold entry. */
  def cachedRddId(df: Dataset[_]): Option[Int] = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val cm = classic.sparkSession.sharedState.cacheManager
    cm.lookupCachedData(classic).flatMap { cd =>
      val b = cd.cachedRepresentation.cacheBuilder
      if (b.isCachedColumnBuffersLoaded) Some(b.cachedColumnBuffers.id)
      else None
    }
  }
}
