package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q97's state-boundedness claim, MEASURED (round-11 verdict #7):
  * LateDropSpec pins watermark drop counts; this pins the stream-stream
  * join's state EVICTION. The staged 6-slab arrival (≈5 days of event
  * time per slab, far past the 1 h + 10 min state horizon) must show
  * per-batch state-store row counts that PLATEAU — an unbounded join
  * (missing watermark or unbounded condition) accumulates both streams
  * and the final batch's numRowsTotal equals cumulative input. And
  * because the horizon covers the join window by construction, eviction
  * must cost nothing: the multi-batch result must equal q97's
  * single-batch answer row for row. */
class JoinStateBoundSpec extends SparkSpec {

  test("q97: join state plateaus under staged arrival and loses no match") {
    val d = sf0001
    val (df, progs) = Streaming.ssJoinStateWithProgress(spark, d)
    val stateBatches = progs
      .filter(_.stateOperators.nonEmpty)
      .sortBy(_.batchId)
    val statePerBatch = stateBatches.map(p =>
      (p.batchId, p.numInputRows, p.stateOperators.map(_.numRowsTotal).sum))
    statePerBatch.foreach { case (b, in, st) =>
      info(s"batch=$b in=$in stateRows=$st")
    }
    val totalIn = statePerBatch.map(_._2).sum
    val maxState = statePerBatch.map(_._3).max
    val lastState = statePerBatch.last._3
    // 6 equal slabs: unbounded accumulation would end at ~totalIn rows
    // in state (each input row buffered on its side). Eviction keeps the
    // working set near ONE slab (≤ totalIn/6 live + one slab awaiting
    // the next batch's watermark application — the N→N+2 enforcement
    // lag q303 measured). 1/2 is the loose structural bound that an
    // unbounded join cannot meet while a correct one sits far below.
    assert(statePerBatch.size >= 5, s"expected >=5 state batches, got $statePerBatch")
    assert(maxState < totalIn / 2,
      s"state never evicted: max $maxState of $totalIn cumulative input")
    assert(lastState < totalIn / 2,
      s"final state $lastState looks accumulated, not evicted ($totalIn in)")
    // the state sequence must actually go DOWN at least once (plateau ≠
    // monotone growth) — a pure upper bound could pass by luck on a
    // sparse corpus
    val seq = statePerBatch.map(_._3)
    assert(seq.zip(seq.tail).exists { case (a, b) => b < a },
      s"state grew monotonically: $seq")
    // eviction lost nothing: identical rows to q97's single-batch run
    val staged = df.collect().map(_.toString).sorted
    val single = graft.SparkEntry.queries("q97_stream_stream_join")(spark, d)
      .collect().map(_.toString).sorted
    assert(staged.length == single.length && staged.sameElements(single),
      s"staged run diverged from single-batch q97: " +
        s"${staged.length} vs ${single.length} rows")
  }
}
