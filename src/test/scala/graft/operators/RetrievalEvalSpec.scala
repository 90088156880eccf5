package graft.operators

import graft.SparkSpec

/** q218's harness must be PROVABLY correct even though the suite corpus
  * scores near chance (31-term vocabulary — no term isolates a doc, a
  * measured property the query's scaladoc documents): on an engineered
  * corpus where every query doc carries planted UNIQUE terms, the
  * rarest-term query builder must pick exactly those terms and BM25
  * must put the source doc at rank 1 — so target_rank / rr_micro /
  * hit@10 are pinned end to end through the identical pipeline. */
class RetrievalEvalSpec extends SparkSpec {

  test("engineered corpus with planted unique terms: every query hits rank 1") {
    import spark.implicits._
    val filler = "alpha beta gamma delta epsilon zeta"
    val docs = (0L to 25L).map { id =>
      val planted =
        if (id % 13 == 0) s" uq${id}a uq${id}b uq${id}c uq${id}d" else ""
      (id, filler + planted)
    }.toDF("doc_id", "text")
    val rows = TextAnalysis.knownItemEvalOn(spark, docs)
      .orderBy("query_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 13L))
    rows.foreach { r =>
      assert(r.getLong(1) == 1L,
        s"query ${r.getLong(0)}: planted unique terms must rank the " +
          s"source first, got rank ${r.getLong(1)}")
      assert(r.getLong(2) == 1000000L)
      assert(r.getBoolean(3))
    }
  }

  test("a missing target reports rank 0 / rr 0 / no hit") {
    import spark.implicits._
    // query doc 0's rarest terms are planted in ELEVEN other docs but
    // scrubbed from doc 0's own text beyond one copy... simpler: doc 0
    // queries with terms that dominate in other DOCS: doc 0 holds the
    // four rare terms once each inside a very LONG document, while ten
    // short docs each carry all four terms too — BM25's length
    // normalization ranks the short docs above the long source, pushing
    // it out of the top-10
    val longFiller = (1 to 400).map(i => s"w${i % 7}").mkString(" ")
    val competitors = (1L to 10L).map(i => (i, "rare1 rare2 rare3 rare4"))
    // 20 extra filler docs push the w* terms' df above the rare terms'
    // (21+ vs 11), so the rarest-term builder picks rare1..rare4 for
    // doc 0 — the terms whose competition then buries it
    // ids ≡ 1 (mod 13) so no filler ever becomes a query itself
    val fillers = (0L to 19L).map(k => (14L + 13L * k, "w0 w1 w2 w3 w4 w5 w6"))
    val docs = (Seq((0L, s"$longFiller rare1 rare2 rare3 rare4")) ++
      competitors ++ fillers).toDF("doc_id", "text")
    val rows = TextAnalysis.knownItemEvalOn(spark, docs).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 0L)
    val r = rows.head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && !r.getBoolean(3),
      s"expected a top-10 miss, got ${r.mkString(",")}")
  }
}
