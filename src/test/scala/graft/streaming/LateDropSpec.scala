package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q303's semantics claim, MEASURED: the 2-day-late batch must be
  * dropped by the watermark — Σ numRowsDroppedByWatermark across
  * batches equals the planted late-row count exactly, and the emitted
  * windows contain no late contribution. */
class LateDropSpec extends SparkSpec {

  test("q303: every planted late row is dropped by the watermark") {
    val d = sf0001
    val (df, progs) = Streaming.lateDropWithProgress(spark, d)
    val rows = df.collect()
    progs.foreach { p =>
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      info(s"batch=${p.batchId} in=${p.numInputRows} dropped=$dropped " +
        s"wm=${p.eventTime.get("watermark")}")
    }
    val expectedLate = graft.Tables.events(spark, d)
      .where(pmod(col("event_id"), lit(101)) === 0).count()
    val droppedTotal =
      progs.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    assert(droppedTotal == expectedLate,
      s"dropped $droppedTotal != planted late $expectedLate")
    // and the output equals the on-time-only batch aggregate
    val expect = graft.Tables.events(spark, d)
      .where(pmod(col("event_id"), lit(101)) =!= 0)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      assert(expect(r.getTimestamp(0)) == r.getLong(1),
        s"window ${r.getTimestamp(0)}")
    }
  }
}
