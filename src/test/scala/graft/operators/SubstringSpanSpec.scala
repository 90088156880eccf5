package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q109 exact-substring span semantics, pinned on an engineered corpus
  * where the expected spans are known by construction (the sf tables only
  * prove corpus-level agreement with the oracle; these pin the MERGE
  * rules: maximality, island splitting, within-doc repeats). */
class SubstringSpanSpec extends SparkSpec {

  private def runOn(rows: Seq[(Long, String)],
                    query: String = "q109_substring_spans"): Map[Long, (Long, Long, Long, Double)] = {
    import spark.implicits._
    val dir = tempDir("graft_spans").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.queries(query)(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
  }

  // unique vocabularies so nothing collides except what the test plants
  private def words(tag: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$tag$i")

  test("a 14-token run shared by two docs merges into ONE maximal span on each side") {
    val shared = words("s", 14)
    val d1 = words("a", 4) ++ shared ++ words("b", 12) // shared at pos 5..18
    val d2 = words("c", 2) ++ shared ++ words("d", 9)  // shared at pos 3..16
    val got = runOn(Seq(1L -> d1.mkString(" "), 2L -> d2.mkString(" "),
      3L -> words("z", 30).mkString(" ")))
    // 5 consecutive window starts (14-10+1) merge to one span of 14 tokens
    assert(got(1L) == ((1L, 14L, 30L, 0.466667)), got(1L).toString)
    assert(got(2L) == ((1L, 14L, 25L, 0.56)), got(2L).toString)
    assert(!got.contains(3L), "unique doc must produce no span row")
  }

  test("two disjoint shared runs stay two islands; within-doc repeat is a dup") {
    val r1 = words("p", 10) // exactly one window each
    val r2 = words("q", 10)
    // doc 1 carries both runs separated by unique filler -> 2 spans
    val d1 = r1 ++ words("f", 5) ++ r2
    // doc 2/3 carry one run each (the cross-doc partners)
    val got = runOn(Seq(
      1L -> d1.mkString(" "),
      2L -> (words("g", 3) ++ r1 ++ words("h", 3)).mkString(" "),
      // doc 4: the same 10-token block twice -> dup with ITSELF, two
      // islands (positions 1 and 11 are not adjacent), whole doc covered
      3L -> (words("k", 7) ++ r2).mkString(" "),
      4L -> (words("x", 10) ++ words("x", 10)).mkString(" ")))
    assert(got(1L) == ((2L, 20L, 25L, 0.8)), got(1L).toString)
    assert(got(2L) == ((1L, 10L, 16L, 0.625)), got(2L).toString)
    assert(got(3L) == ((1L, 10L, 17L, 0.588235)), got(3L).toString)
    assert(got(4L) == ((2L, 20L, 20L, 1.0)), got(4L).toString)
  }

  test("property: q109 matches a local brute-force span reference on random corpora") {
    // tiny vocabulary => organic window collisions everywhere: heavy
    // overlaps, within-doc repeats, islands that touch — the adversarial
    // regime for the gaps-and-islands merge. Reference = literal window
    // multiset counting + island folding in plain Scala.
    val W = Dedup.SpanWin
    def reference(docs: Seq[(Long, Seq[String])]): Map[Long, (Long, Long, Long, Double)] = {
      val wins = docs.flatMap { case (id, ts) =>
        (0 to ts.length - W).map(p => (id, p + 1, ts.slice(p, p + W).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (k, v) => k -> v.size }
      docs.flatMap { case (id, ts) =>
        val ps = wins.filter(w => w._1 == id && counts(w._3) >= 2).map(_._2).sorted
        if (ps.isEmpty) None else {
          val islands = ps.foldLeft(List.empty[(Int, Int)]) {
            case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
            case (acc, p) => (p, p) :: acc
          }.reverse
          val spans = islands.map { case (s, e) => (s, e + W - 1) }
          val dup = spans.map { case (s, e) => e - s + 1 }.sum.toLong
          val frac = math.round(dup.toDouble / ts.length * 1e6) / 1e6
          Some(id -> ((islands.length.toLong, dup, ts.length.toLong, frac)))
        }
      }.toMap
    }
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 4) {
      val vocab = Vector("a", "b", "c").take(2 + trial % 2)
      val docs = (0L until (15 + rnd.nextInt(20)).toLong).map { id =>
        val len = W + rnd.nextInt(30)
        id -> Vector.fill(len)(vocab(rnd.nextInt(vocab.length)))
      }
      val strs = docs.map { case (id, ts) => id -> ts.mkString(" ") }
      val want = reference(docs)
      assert(runOn(strs) == want, s"trial=$trial (q109)")
      assert(runOn(strs, "q113_spans_rolling") == want, s"trial=$trial (q113)")
    }
  }

  test("rolling_window_hashes: recurrence equals from-scratch polynomial, split parity") {
    import graft.functions.RollingWindowHashes.{compute, Base}
    import org.apache.spark.unsafe.types.UTF8String
    def tokHash(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    def scratch(text: String, w: Int): Seq[Long] = {
      val toks = text.split(" ", -1).toSeq // split(text,' ') semantics
      if (toks.length < w) Nil
      else (0 to toks.length - w).map(p =>
        toks.slice(p, p + w).foldLeft(0L)((h, t) => h * Base + tokHash(t)))
    }
    val rnd = new scala.util.Random(23)
    val cases = Seq("", " ", "a", "a b", "a  b ", "x " * 30 + "x") ++
      (0 until 20).map(_ => Seq.fill(3 + rnd.nextInt(40))(
        s"t${rnd.nextInt(6)}").mkString(" "))
    for (text <- cases; w <- Seq(1, 2, 10)) {
      val got = compute(UTF8String.fromString(text), w)
        .toLongArray().toSeq
      assert(got == scratch(text, w), s"text='$text' w=$w")
    }
  }

  test("q113 rolling twin: identical output to q109, incl. whitespace edges") {
    val shared = words("s", 14).mkString(" ")
    // double/trailing spaces: split(text, ' ') keeps empty tokens, and the
    // rolling tokenizer must agree with it token-for-token
    val corpus = Seq(
      1L -> s"${words("a", 4).mkString(" ")} $shared ${words("b", 12).mkString(" ")}",
      2L -> s"${words("c", 2).mkString(" ")} $shared",
      3L -> (words("x", 10) ++ words("x", 10)).mkString(" "),
      4L -> (words("e", 6).mkString(" ") + "  " + shared + " "), // "" tokens
      5L -> (words("f", 6).mkString(" ") + "  " + shared + " "))
    assert(runOn(corpus, "q113_spans_rolling") == runOn(corpus))
    // and on the real corpus
    val q109 = Dedup.queries("q109_substring_spans")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val q113 = Dedup.queries("q113_spans_rolling")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(q113 == q109, "rolling-hash twin must not change a bit")
  }

  test("q113 plan: fused rolling expression, no md5/slice re-hash per window") {
    val p = Dedup.queries("q113_spans_rolling")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("rolling_window_hashes"),
      "window hashing must go through the fused codegen expression")
    assert(!p.contains("md5"), "the rolling twin must not fall back to md5")
  }

  test("q109 plan: no cartesian/nested-loop join, windows partition by doc_id") {
    val p = Dedup.queries("q109_substring_spans")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "span detection must never form a pair join")
    assert(p.contains("LeftSemi"), "dup-hash join-back is a semi-join")
  }

  private def runRemoval(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    val dir = tempDir("graft_spanrm").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.queries("q114_span_removal")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q114 removal: canonical doc survives verbatim, borrower is cut, full-borrow empties") {
    val shared = words("s", 14)
    val d1 = words("a", 4) ++ shared ++ words("b", 12) // canonical owner
    val d2 = words("c", 2) ++ shared ++ words("d", 9)  // borrower: s cut
    val d4 = words("x", 10) ++ words("x", 10)          // within-doc repeat
    val got = runRemoval(Seq(
      1L -> d1.mkString(" "), 2L -> d2.mkString(" "),
      3L -> words("z", 30).mkString(" "), 4L -> d4.mkString(" "),
      // doc 5 is d1's text verbatim -> every window borrowed -> empties
      5L -> d1.mkString(" ")))
    assert(got(1L) == ((0L, 0L, 30L, md5hex(d1.mkString(" ")))), got(1L).toString)
    val d2clean = (words("c", 2) ++ words("d", 9)).mkString(" ")
    assert(got(2L) == ((1L, 14L, 11L, md5hex(d2clean))), got(2L).toString)
    assert(got(3L) == ((0L, 0L, 30L, md5hex(words("z", 30).mkString(" ")))),
      got(3L).toString)
    // second x-run removed (its windows rehit pos-1 hashes), first kept
    assert(got(4L) == ((1L, 10L, 10L, md5hex(words("x", 10).mkString(" ")))),
      got(4L).toString)
    assert(got(5L) == ((1L, 30L, 0L, md5hex(""))), got(5L).toString)
  }

  test("property: q114 matches a local brute-force removal reference on random corpora") {
    val W = Dedup.SpanWin
    def reference(docs: Seq[(Long, Seq[String])]): Map[Long, (Long, Long, Long, String)] = {
      val wins = docs.flatMap { case (id, ts) =>
        (0 to ts.length - W).map(p => (id, p + 1, ts.slice(p, p + W).mkString(" ")))
      }
      val nonCanon = wins.groupBy(_._3).values.flatMap(_.sortBy(w => (w._1, w._2)).drop(1))
      val coveredBy = nonCanon.toSeq.groupBy(_._1).map { case (id, ws) =>
        id -> ws.flatMap(w => w._2 until w._2 + W).toSet
      }
      docs.map { case (id, ts) =>
        val cov = coveredBy.getOrElse(id, Set.empty[Int]).toSeq.sorted
        val islands = cov.foldLeft(0L) {
          case (n, p) if cov.contains(p - 1) => n
          case (n, _) => n + 1
        }
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !cov.contains(i + 1) => t }
        id -> ((islands, cov.size.toLong, kept.size.toLong,
          md5hex(kept.mkString(" "))))
      }.toMap
    }
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val vocab = Vector("a", "b", "c").take(2 + trial % 2)
      val docs = (0L until (15 + rnd.nextInt(20)).toLong).map { id =>
        val len = W + rnd.nextInt(30)
        id -> Vector.fill(len)(vocab(rnd.nextInt(vocab.length)))
      }
      val strs = docs.map { case (id, ts) => id -> ts.mkString(" ") }
      assert(runRemoval(strs) == reference(docs), s"trial=$trial")
    }
  }

  test("q114 plan: no pair join; reconstruction is a per-row filter, not a token shuffle") {
    val p = Dedup.queries("q114_span_removal")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "removal must never form a pair join")
    assert(p.contains("rolling_window_hashes"),
      "q114 must ride the fused rolling-hash window stage")
  }

  test("q109 on the corpus: spans lie inside docs and fractions are sane") {
    val rows = Dedup.queries("q109_substring_spans")(spark, sf0001).collect()
    assert(rows.nonEmpty, "sf0.001 contains duplicated substrings")
    rows.foreach { r =>
      val (nSpans, dupToks, nToks, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nSpans >= 1 && dupToks >= Dedup.SpanWin && dupToks <= nToks,
        r.toString)
      assert(frac > 0.0 && frac <= 1.0, r.toString)
    }
  }
}
