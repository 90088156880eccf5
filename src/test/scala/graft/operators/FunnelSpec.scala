package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q213's funnel semantics pinned on ENGINEERED event streams through
  * the identical pipeline (funnelOver): subsequence matching must honor
  * event-time ORDER (not mere presence), tolerate interleaved noise,
  * not double-count repeated stages, and produce the documented integer
  * basis-point conversions. */
class FunnelSpec extends SparkSpec {

  private def ev(user: Long, seq: String) = {
    // one event per char, at strictly increasing timestamps
    seq.zipWithIndex.map { case (c, i) =>
      val ty = c match {
        case 'v' => "view"
        case 'c' => "click"
        case 'p' => "purchase"
        case 's' => "signup"
        case _ => "error"
      }
      (user, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        user * 1000 + i, ty)
    }
  }

  test("order matters, noise tolerated, repeats not double-counted") {
    import spark.implicits._
    val events = (
      ev(1, "vcp") ++     // clean full conversion
      ev(2, "pcv") ++     // all three stages PRESENT but wrong order:
                          // stage 1 only (the v at the end)
      ev(3, "vsecsp") ++  // noise between stages: v..c..p converts
      ev(4, "vvccpp") ++  // repeated stages: ONE user, counted once
      ev(5, "vc") ++      // stops after click
      ev(6, "se")         // never views
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = Relational.funnelOver(events).orderBy("stage").collect()
    // users: 6; stage1 (saw v): 1,2,3,4,5 = 5; stage2 (v then c):
    // 1,3,4,5 = 4; stage3: 1,3,4 = 3
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 5L), (2L, 4L), (3L, 3L)))
    // conversions in basis points: 5/6, 4/5, 3/4 under integer div
    assert(rows.map(_.getLong(3)).toSeq ==
      Seq(5L * 10000 / 6, 4L * 10000 / 5, 3L * 10000 / 4))
  }

  test("an out-of-order arrival is repaired by event-time sort") {
    import spark.implicits._
    // the purchase ARRIVES first (event_id 9000) but its event TIME is
    // last — the funnel must sort by (ts, event_id), not arrival
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 9000L, "purchase"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 9001L, "view"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 9002L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = Relational.funnelOver(events).orderBy("stage").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L),
      "event-time order must place the early-arriving purchase last")
  }
}
