package graft.streaming

import graft.SparkSpec

/** State-store PROVIDER matrix (round-11 verdict #6): the suite's
  * stateful streams run on the default HDFS-backed store, but a 100 TB
  * deployment runs RocksDB — re-run each one under
  * `RocksDBStateStoreProvider` and assert bit-identical results.
  *
  * Coverage notes:
  *  - q126/q295/q268 (the transformWithState family) are NOT matrixed:
  *    they already force RocksDB on their own session clone in-code
  *    (typed-state column families are a RocksDB feature — the provider
  *    is part of the operator's contract, not a deployment choice), so
  *    a matrix leg would re-run the same provider twice.
  *  - q142 (state data source) is the strongest leg: with the provider
  *    class mixed into its checkpoint memo key (Streaming.scala), the
  *    RocksDB leg BUILDS a RocksDB-formatted checkpoint and then READS
  *    the keyed state back through `format("statestore")` — ingest →
  *    RocksDB commit → state scan, all provider-native.
  *  - Semantics observed: none differ. Aggregation state, stream-stream
  *    join buffers, dedup sets, session timers and watermark late-drops
  *    all produce identical rows under both providers — the provider
  *    changes the state BACKEND (changelog/snapshot files vs HDFS delta
  *    files under the checkpoint), never the operator semantics. The
  *    backend difference that IS observable (checkpoint file layout) is
  *    exactly why q142's memo key is provider-qualified.
  */
class StateStoreMatrixSpec extends SparkSpec {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Stateful queries whose provider is a free deployment choice. */
  private val Matrixed = Seq(
    "q97_stream_stream_join",   // stream-stream join buffers
    "q98_stream_dedup",         // dropDuplicates key set
    "q107_stream_heavy_hitters",// flatMapGroupsWithState sketch state
    "q122_stream_sliding",      // windowed aggregation state
    "q142_statestore_read",     // checkpoint build + state-source read
    "q159_stream_session_timers", // mapGroupsWithState + timers
    "q303_stream_late_drop",    // watermark late-drop accounting
    "q308_stream_dedup_wm")     // dropDuplicatesWithinWatermark

  private def resultRows(name: String, provider: Option[String]): Seq[String] = {
    val s2 = graft.Tables.sessionClone(spark)
    provider.foreach(p =>
      s2.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    // multiset compare: every matrixed query orders its output, but the
    // sort keeps the assert independent of that contract
    graft.SparkEntry.queries(name)(s2, sf0001).collect()
      .map(_.toString).toSeq.sorted
  }

  Matrixed.foreach { name =>
    test(s"$name: identical results under HDFS-backed and RocksDB stores") {
      val base = resultRows(name, None)
      val rocks = resultRows(name, Some(Rocks))
      assert(base.nonEmpty, s"$name returned no rows")
      assert(base == rocks,
        s"$name diverged across state-store providers:\n" +
          s"  hdfs-only: ${base.diff(rocks).take(5).mkString("; ")}\n" +
          s"  rocks-only: ${rocks.diff(base).take(5).mkString("; ")}")
    }
  }
}
