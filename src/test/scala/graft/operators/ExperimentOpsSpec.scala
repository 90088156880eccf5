package graft.operators

import graft.SparkSpec
import java.security.MessageDigest

/** Engineered-corpus proofs for the experimentation operators, through
  * the IDENTICAL pipelines the suite queries run (the knownItemEvalOn
  * discipline): q253's Kaplan-Meier must reduce to the textbook
  * empirical survival function when no observation is censored, must
  * classify a past-window conversion as censored (not a death), and
  * q254's SRM gate must trip on a deliberately broken 90/10
  * assignment. */
class ExperimentOpsSpec extends SparkSpec {

  private def md5hex(x: String): String =
    MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** the query's own deterministic observation window for a user. */
  private def windowOf(userId: Long): Long =
    1 + (Integer.parseInt(md5hex(s"cens_$userId").substring(0, 1), 16)) % 8

  /** arm assignment the query derives from the same hash. */
  private def armOf(userId: Long): String =
    if (Integer.parseInt(md5hex(s"ab_$userId").substring(0, 1), 16) % 2 == 0)
      "A" else "B"

  private val DayUs = 86400000000L

  private def eventsFrame(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("user_id", "event_type", "ts")
  }

  test("KM with zero censoring IS the empirical survival function") {
    // every user converts exactly AT their own md5 window (dur == w, so
    // dur <= w holds): no censoring anywhere, and the KM product must
    // collapse to S(t) = (# users with dur > t) / N — the textbook
    // identity, checked against independently-computed Scala truth
    val users = (0L until 40L)
    val rows = users.flatMap { u =>
      val w = windowOf(u)
      Seq((u, "view", 0L), (u, "purchase", w * DayUs))
    }
    val got = Relational.kaplanMeierOn(eventsFrame(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6))).toSeq
    val durs = users.map(windowOf)
    val n = durs.size.toLong
    got.foreach { case (day, d, c, nAtRisk, survNano) =>
      assert(c == 0L, s"day $day: no observation may be censored, got c=$c")
      assert(d == durs.count(_ == day).toLong)
      assert(nAtRisk == durs.count(_ >= day).toLong)
      val surviving = durs.count(_ > day).toLong
      if (surviving > 0) {
        val exact = math.round(surviving.toDouble / n * 1e9)
        assert(math.abs(survNano - exact) <= 5,
          s"day $day: KM $survNano vs empirical $exact — the " +
            "no-censoring identity broke (beyond ln/exp round-trip ulp)")
      } else
        assert(survNano == 0L, s"day $day: all converted, S must be 0")
    }
  }

  test("a past-window conversion is censored at the window, never a death") {
    // one user converts 100 days out with a <=8-day window: the single
    // observation must land at day w as c=1, d=0 — and with d=0
    // everywhere survival stays exactly 1e9
    val u = 7L
    val rows = Seq((u, "view", 0L), (u, "purchase", 100L * DayUs))
    val got = Relational.kaplanMeierOn(eventsFrame(rows)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == windowOf(u), "censoring day must be the window")
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L,
      "the conversion past the window must count as censored, not dead")
    assert(r.getLong(6) == 1000000000L,
      "with no deaths the survival curve must stay at exactly 1.0")
  }

  test("SRM gate trips on an engineered 90/10 assignment, passes on 50/50") {
    // pick user ids BY the query's own hash so the broken corpus is
    // 90 A-users vs 10 B-users: chi2 = (80²·1000)/100 = 64000 milli —
    // far beyond 3.841; a balanced 50/50 corpus must pass
    val aIds = Iterator.from(0).map(_.toLong).filter(armOf(_) == "A")
      .take(90).toSeq
    val bIds = Iterator.from(0).map(_.toLong).filter(armOf(_) == "B")
      .take(10).toSeq
    val broken = eventsFrame((aIds ++ bIds).map(u => (u, "view", 0L)))
    val gb = Relational.abSrmOn(broken).collect()
    assert(gb.forall(r => !r.getBoolean(6)), "90/10 must trip the alarm")
    assert(gb.head.getLong(5) == 64000L,
      s"exact chi2 milli must be (80^2*1000)/100, got ${gb.head.getLong(5)}")
    val balanced = eventsFrame(
      (aIds.take(50) ++ bIds.take(10) ++ Iterator.from(100).map(_.toLong)
        .filter(armOf(_) == "B").take(40).toSeq).map(u => (u, "view", 0L)))
    val gg = Relational.abSrmOn(balanced).collect()
    assert(gg.forall(_.getBoolean(6)), "an exact 50/50 split must pass")
  }

  test("q260 on a constant base series: exact closed-form recovery, " +
    "zero residuals") {
    import org.apache.spark.sql.functions._
    // c = 5 events on each of 28 days — the only structure in the
    // series is the pipeline's own +60 weekend plant, so the
    // decomposition must recover it EXACTLY: every full 7-day window
    // holds one dow-5 and one dow-6 ⇒ s7 = 7c + 120, trend_milli =
    // 1000c + floor(120000/7) = 1000c + 17142, weekday detrended =
    // −17142, weekend = +60000 − 17142 = +42858 (the 60k·5/7 closed
    // form), seasonal = the same values (means of identical rows),
    // and EVERY residual is identically 0.
    val ev = spark.range(28L * 5)
      .select(expr("timestamp_micros((id div 5) * 86400000000 + (id % 5))")
        .as("ts"))
    val out = Relational.seasonalDecompOn(ev).collect()
    assert(out.length == 22) // days 3..24 carry full windows
    out.foreach { r =>
      val (dow, trend, det, sMilli, resid) = (r.getLong(4), r.getLong(2),
        r.getLong(3), r.getLong(5), r.getLong(6))
      assert(trend == 5000L + 17142L)
      val expected = if (dow == 5 || dow == 6) 42858L else -17142L
      assert(det == expected, s"dow $dow detrended $det")
      assert(sMilli == expected, s"dow $dow seasonal $sMilli")
      assert(resid == 0L, s"dow $dow residual $resid")
    }
  }
}
