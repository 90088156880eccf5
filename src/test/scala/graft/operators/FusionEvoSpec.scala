package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 additions: RRF hybrid-retrieval fusion (q165) and the
  * schema-evolution merged read (q166). Each test pins the semantic
  * invariant the DuckDB oracle cannot see from hash equality alone.
  */
class FusionEvoSpec extends SparkSpec {

  private def rrfOf(rk: Option[Long]): Long =
    rk.map(r => 1000000000L / (60L + r)).getOrElse(0L)

  test("q165: rrf is the exact integer RRF of the two leg ranks; ranks ordered") {
    val rows = Similarity.queries("q165_rrf_fusion")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    def optLong(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    rows.foreach { r =>
      val (lex, dense) = (optLong(r, 3), optLong(r, 4))
      // a fused row must come from at least one leg, and its score must BE
      // the integer RRF recomputed from the leg ranks — never a float path
      assert(lex.isDefined || dense.isDefined)
      assert(r.getLong(2) == rrfOf(lex) + rrfOf(dense),
        s"row $r: rrf != div-sum of leg ranks")
      lex.foreach(v => assert(v >= 1 && v <= 10))
      dense.foreach(v => assert(v >= 1 && v <= 10))
    }
    rows.groupBy(_.getLong(0)).foreach { case (qid, qrows) =>
      assert(qrows.length <= 10)
      val byRank = qrows.sortBy(_.getLong(5))
      assert(byRank.map(_.getLong(5)).toSeq == (1L to byRank.length).toSeq,
        s"query $qid: ranks not contiguous")
      // (rrf desc, doc_id asc) ordering law
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1)))
      }
    }
    // the fusion is genuinely hybrid on this corpus: some kept docs are
    // lexical-only and some dense-only (else the join degenerates)
    assert(rows.exists(_.isNullAt(3)) && rows.exists(_.isNullAt(4)))
  }

  test("q166: merged schema is the 5-column superset; null-fill follows the batch rule") {
    val merged = graft.sources.SchemaEvolutionStage.mergedRead(spark, sf0001)
    assert(merged.columns.sorted.toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    val docs = graft.Tables.t(spark, sf0001, "documents")
    assert(merged.count() == docs.count())
    // v1 files (even ids) predate source/n_chars: NULL-filled; v2 files
    // (odd ids) dropped lang: NULL-filled — both directions of drift
    assert(merged.filter(col("doc_id") % 2 === 0)
      .filter(col("source").isNotNull || col("n_chars").isNotNull ||
        col("lang").isNull).count() == 0)
    assert(merged.filter(col("doc_id") % 2 === 1)
      .filter(col("lang").isNotNull || col("source").isNull ||
        col("n_chars").isNull).count() == 0)
  }

  test("q170: late-interaction scores equal an in-memory max-sim model bit-for-bit") {
    val vecs = graft.Tables.t(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        nx += a(i).toDouble * a(i).toDouble
        ny += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      if (den == 0.0) 0.0 else dot / den
    }
    def toks(v: Array[Float]): Seq[Array[Float]] =
      (0 until 8).map(t => v.slice(t * 8, t * 8 + 8))
    def li(q: Long, d: Long): Long =
      toks(vecs(q)).map { qv =>
        math.round(toks(vecs(d)).map(dv => cos(qv, dv)).max * 1e9)
      }.sum
    val rows = Similarity.queries("q170_late_interaction")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, d, score) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(score == li(q, d),
        s"late-interaction score for ($q,$d): got $score, model ${li(q, d)}")
      assert(score <= 8L * 1000000000L)
    }
    // the paradigm is genuinely different from single-vector cosine on
    // this corpus: at least one query's top-10 SET differs from q70's
    val single = Similarity.queries("q70_knn_brute")(spark, sf0001).collect()
      .filter(r => r.getLong(0) < 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val late = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(late.keySet == single.keySet)
    assert(late.exists { case (q, docs) => docs != single(q) },
      "late interaction should re-rank at least one query differently")
  }

  test("q171: CDC apply matches a sequential log-replay model; all outcomes live") {
    val rows = Relational.queries("q171_cdc_apply")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // sequential replay: apply every change in (ts, event_id) order to a
    // key->cents map seeded from the base snapshot — the semantics the
    // distributed compact-then-merge plan must reproduce
    val base = graft.Tables.t(spark, sf0001, "customer")
      .select(col("c_custkey").cast("long"),
        graft.Tables.cents(col("c_acctbal"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changes = graft.Tables.events(spark, sf0001)
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), graft.Tables.cents(col("value")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3)) ++
      Seq((20000L, 1L, 9000001L, 11100L), (30000L, 1L, 9000002L, -1L))
    var state = base
    changes.foreach { case (key, _, eid, cents) =>
      if (eid % 7 == 0 || eid == 9000002L) state -= key
      else state += key -> cents
    }
    val got = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == state,
      s"final state diverges from sequential replay: " +
        s"missing=${(state.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- state.keySet).take(5)}")
    val srcs = rows.map(_.getString(1)).toSet
    assert(srcs == Set("base", "insert", "update"),
      s"all three surviving outcomes must occur, got $srcs")
    assert(got.get(20000L).contains(11100L), "synthetic insert must land")
    assert(!got.contains(30000L), "delete of an absent key is a no-op")
  }

  test("q173: median/MAD gate equals a brute sequential model; robust to the outliers it flags") {
    val vals = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), graft.Tables.cents(col("value")))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    def med2(xs: Vector[Long]): Long =
      if (xs.length % 2 == 1) 2 * xs(xs.length / 2)
      else xs(xs.length / 2 - 1) + xs(xs.length / 2)
    val rows = Relational.queries("q173_mad_outliers")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == vals.keySet)
    rows.foreach { r =>
      val xs = vals(r.getString(0))
      val m2 = med2(xs)
      assert(r.getLong(2) == m2, s"${r.getString(0)}: med2")
      val dev2s = xs.map(x => math.abs(2 * x - m2)).sorted
      val m4 = med2(dev2s)
      assert(r.getLong(3) == m4, s"${r.getString(0)}: mad4")
      assert(r.getLong(1) == xs.length)
      assert(r.getLong(4) == dev2s.count(d2 => 2 * d2 > 3 * m4),
        s"${r.getString(0)}: outlier count")
      // gate is live but not degenerate on this data
      assert(r.getLong(4) > 0 && r.getLong(4) < xs.length / 2)
    }
  }

  test("q175: Gini equals the brute sorted-rank formula; bounds hold") {
    val tf = graft.Tables.t(spark, sf0001, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = TextAnalysis.queries("q175_gini")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val fs = tf.filter(_._1 == lang).map(_._3).sorted
      val n = fs.length.toLong
      val tot = fs.sum
      val num = fs.zipWithIndex.map { case (f, i) =>
        (2L * (i + 1) - n - 1) * f
      }.sum
      assert(r.getLong(1) == n && r.getLong(2) == tot)
      assert(r.getLong(3) == num, s"$lang: gini_num")
      val bp = r.getLong(4)
      assert(bp == 10000L * num / (n * tot))
      // a real mixed-frequency vocabulary: strictly inside (0, 1)
      assert(bp > 0 && bp < 10000, s"$lang: bp=$bp")
    }
  }

  test("q178: sketch set-op estimates track exact truth within KMV error") {
    val rows = Relational.queries("q178_kmv_setops")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exInter, exUnion) = (r.getLong(2), r.getLong(3))
      val (unionEst, jacBp, interEst) =
        (r.getDouble(4), r.getLong(5), r.getLong(6))
      assert(exInter <= exUnion)
      assert(jacBp >= 0 && jacBp <= 10000)
      // KMV with k=64 has ~1/sqrt(62) ≈ 12.7% std error on the union;
      // 4 sigma covers the estimate without making the test vacuous.
      // (thin groups fall back to exact and pass trivially by the rule)
      assert(math.abs(unionEst - exUnion) <= math.max(4, 0.5 * exUnion),
        s"${r.getString(0)}/${r.getString(1)}: union est $unionEst vs $exUnion")
      assert(math.abs(interEst - exInter) <= math.max(6, 0.6 * exInter),
        s"${r.getString(0)}/${r.getString(1)}: inter est $interEst vs $exInter")
    }
  }

  test("q179: negative funnel equals a sequential replay; both outcomes occur") {
    val evs = graft.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "error", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def side(t: String) = t match {
      case "click" => 0; case "error" => 1; case _ => 2
    }
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.toSeq.sortBy(r => (r._2, side(r._4), r._3))
      var lastClick: Option[(Long, Long, Long)] = None // (id, us, errsSoFar)
      var errs = 0L
      ordered.flatMap { case (_, us, id, t) =>
        t match {
          case "click" => lastClick = Some((id, us, errs)); None
          case "error" => errs += 1; None
          case _ =>
            val m = lastClick.filter(c => us - c._2 <= 86400000000L)
            Some((u, id) -> m.map(c => (c._1, us - c._2, errs - c._3)))
        }
      }
    }.toMap
    val rows = Relational.queries("q179_negative_funnel")(spark, sf0001)
      .collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val exp = expected(key)
      exp match {
        case None =>
          assert(r.isNullAt(2) && !r.getBoolean(5), s"$key: expected no match")
        case Some((cId, gap, nErr)) =>
          assert(r.getLong(2) == cId && r.getLong(3) == gap &&
            r.getLong(4) == nErr, s"$key: match fields")
          assert(r.getBoolean(5) == (nErr == 0L), s"$key: converted flag")
      }
    }
    val conv = rows.count(_.getBoolean(5))
    val blocked = rows.count(r => !r.isNullAt(4) && r.getLong(4) > 0)
    assert(conv > 0 && blocked > 0,
      s"corpus must exercise both outcomes: conv=$conv blocked=$blocked")
  }

  test("q180: TWAP equals a brute per-user segment walk; bounded by min/max") {
    val evs = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        graft.Tables.cents(col("value"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = Relational.queries("q180_twap")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(0)
      val seq = evs.filter(_._1 == u).sortBy(e => (e._2, e._3))
      val durs = seq.zip(seq.tail).map { case (a, b) =>
        (a._4, (b._2 - a._2) / 1000)
      }
      val span = durs.map(_._2).sum
      val num = durs.map { case (v, d) => v * d }.sum
      assert(r.getLong(1) == seq.length)
      assert(r.getLong(2) == span, s"user $u: span")
      assert(r.getLong(3) == num, s"user $u: numerator")
      assert(r.getLong(4) == 1000 * num / span)
      // TWAP lies within the user's value range (weighted-mean law)
      val (mn, mx) = (seq.map(_._4).min, seq.map(_._4).max)
      assert(r.getLong(4) >= 1000 * mn - 1000 && r.getLong(4) <= 1000 * mx + 1000)
    }
  }

  test("q184: the calendar edges are live — clamping and cross-iso-year rows exist") {
    val df = Relational.queries("q184_calendar_edges")(spark, sf0001)
    // month-end clamping actually fires on this data
    assert(df.filter(dayofmonth(col("plus1m")) =!= dayofmonth(col("d0")))
      .count() > 0, "no clamped add_months row — edge untested")
    // some January days belong to the previous ISO year (or a December
    // day to the next) — the year-boundary trap is exercised
    assert(df.filter(col("iso_year") =!= year(col("d0"))).count() > 0,
      "no iso-year/civil-year divergence — edge untested")
  }

  test("q187/q188: transition rows are row-stochastic; chi2 well-formed") {
    val tr = Relational.queries("q187_markov_transitions")(spark, sf0001)
      .collect()
    assert(tr.nonEmpty)
    tr.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val total = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum == total,
        s"$from: counts must partition the row total")
      rows.foreach(r => assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000))
    }
    val chi = Relational.queries("q188_chi2")(spark, sf0001).collect()
    assert(chi.length == 1)
    val (chi2, n, dof) = (chi(0).getLong(0), chi(0).getLong(1),
      chi(0).getLong(2))
    assert(chi2 >= 0 && dof > 0)
    assert(n == graft.Tables.events(spark, sf0001).count())
  }

  test("q194: z-scores are standardized — near-zero mean, unit-scale spread per group") {
    val rows = Relational.queries("q194_zscore")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val zs = rs.map(_._2.toDouble / 1e6)
      val mean = zs.sum / zs.length
      assert(math.abs(mean) < 0.01, s"$t: standardized mean must be ~0, got $mean")
      val varc = zs.map(z => (z - mean) * (z - mean)).sum / (zs.length - 1)
      assert(math.abs(varc - 1.0) < 0.05, s"$t: variance must be ~1, got $varc")
    }
  }

  test("q195: normalization maps group extremes to global extremes, monotone in rank") {
    val rows = Relational.queries("q195_quantile_normalize")(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val (gMin, gMax) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.head._4 == gMin, s"$t: rank 1 must map to the global min")
      assert(byRank.last._4 == gMax, s"$t: rank m must map to the global max")
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"$t: v_norm must be monotone in group rank")
      }
    }
  }

  test("q166: filters still push down to the merged scan") {
    val plan = graft.sources.SchemaEvolutionStage.mergedRead(spark, sf0001)
      .filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"expected n_chars pushdown in:\n$plan")
  }
}
