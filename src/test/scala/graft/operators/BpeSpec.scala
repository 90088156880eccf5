package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q152 — the BPE merge step must be GREEDY LEFT-TO-RIGHT NON-OVERLAPPING
  * (the tokenizer-training contract both engines must agree on; the
  * oracle spells the same semantics positionally with window functions,
  * so these are the cases where a wrong fold would diverge).
  */
class BpeSpec extends SparkSpec {

  /** The derivable-symbol closure of a rank-ordered merge list: single
    * characters are axioms; each merge (a, b) adds a+b iff BOTH parts
    * are already derivable (they always are for a faithfully learned
    * table — asserted, so a corrupt table fails here, not silently).
    * Any multi-char token outside this set cannot be produced by a
    * faithful replay — strictly tighter than the old substring check,
    * which let a replay that glued wrong symbols around a real merge
    * pass. */
  private def derivableSymbols(chars: Set[String],
      mergesInRankOrder: Seq[(String, String)]): Set[String] = {
    val syms = scala.collection.mutable.Set[String]() ++= chars
    mergesInRankOrder.foreach { case (a, b) =>
      assert(syms(a) && syms(b),
        s"merge ($a, $b) has an underivable part — corrupt merge table")
      syms += (a + b)
    }
    syms.toSet
  }

  private def merge(syms: Seq[String], a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(syms).toDF("syms")
      .withColumn("ba", lit(a)).withColumn("bb", lit(b))
      .withColumn("merged", expr(TextAnalysis.bpeMergeExpr))
      .select("merged").as[Seq[String]].head()
  }

  test("greedy non-overlapping merge: the run-alternation cases") {
    // odd run of an (x, x) pair: merge 1st+2nd, 3rd survives alone
    assert(merge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    // even run: two disjoint merges
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // disjoint occurrences both merge
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // the (b, a) pair on the same word: only the interior occurrence
    assert(merge(Seq("a", "b", "a", "b"), "b", "a") == Seq("a", "ba", "b"))
    // a merged symbol never chains into a second merge in the same pass
    assert(merge(Seq("x", "y", "y"), "x", "y") == Seq("xy", "y"))
    // absent pair: identity
    assert(merge(Seq("a", "b"), "b", "b") == Seq("a", "b"))
    // single symbol: identity
    assert(merge(Seq("q"), "a", "b") == Seq("q"))
  }

  test("q152: merge table has one row per round, integer counts, rounds ordered") {
    val rows = graft.SparkEntry.queries("q152_bpe_train")(spark, sf0001)
      .collect()
    assert(rows.length == TextAnalysis.BpeRounds)
    assert(rows.map(_.getLong(0)).toSeq ==
      (1 to TextAnalysis.BpeRounds).map(_.toLong))
    // counts are corpus-weighted and monotone non-increasing is NOT
    // guaranteed (a merged symbol can create a hotter pair), but every
    // count is positive and every merged pair is two non-empty symbols
    rows.foreach { r =>
      assert(r.getLong(3) > 0)
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }

  test("q160: segmentation is lossless and consistent with the merge table") {
    val seg = graft.SparkEntry.queries("q160_bpe_apply")(spark, sf0001)
      .collect()
    val mergeList = graft.SparkEntry.queries("q152_bpe_train")(spark, sf0001)
      .collect().map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(seg.nonEmpty)
    // every multi-char token must be in the derivable-symbol closure of
    // the rank-ordered merge table (chars ⊕ merges) — membership, not
    // substring containment
    val symbols = derivableSymbols(
      seg.flatMap(_.getString(0).map(_.toString)).toSet, mergeList)
    seg.foreach { r =>
      val (word, n, toks) = (r.getString(0), r.getLong(2), r.getString(3))
      val pieces = toks.split('|')
      // lossless: concatenating the tokens reproduces the word exactly
      assert(pieces.mkString == word, s"$word segmented to $toks")
      assert(pieces.length.toLong == n)
      pieces.filter(_.length > 1).foreach { p =>
        assert(symbols(p), s"token $p not derivable from the merge table")
      }
    }
    // the trained segmentation actually compresses: some word has fewer
    // tokens than characters
    assert(seg.exists(r => r.getLong(2) < r.getString(0).length))
  }

  test("q208: encode(training-vocab words) equals q160's trained segmentation") {
    // the judge-grade identity behind the replay: running the encode
    // fold over the TRAINING vocabulary (chars of each word, merges in
    // rank order) must land on exactly the trainer's end-state
    // segmentation — same expression, same table, no drift possible
    val trained = graft.SparkEntry.queries("q160_bpe_apply")(spark, sf0001)
      .select("word", "tokens").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val encoded = TextAnalysis.encodeTrainingVocabForTest(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(encoded.keySet == trained.keySet)
    trained.foreach { case (w, toks) =>
      assert(encoded(w) == toks,
        s"encode($w) = ${encoded(w)} != trained segmentation $toks")
    }
  }

  test("q208: held-out encode is lossless and uses only trained merges") {
    val enc = graft.SparkEntry.queries("q208_bpe_encode")(spark, sf0001)
      .collect()
    val mergeList = graft.SparkEntry.queries("q152_bpe_train")(spark, sf0001)
      .collect().map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(enc.nonEmpty)
    val symbols = derivableSymbols(
      enc.flatMap(_.getString(1).map(_.toString)).toSet, mergeList)
    enc.foreach { r =>
      val (word, held, toks) = (r.getString(0), r.getString(1), r.getString(3))
      assert(held == word + word.reverse)
      assert(toks.split('|').mkString == held, s"$held segmented to $toks")
      toks.split('|').filter(_.length > 1).foreach { p =>
        assert(symbols(p), s"token $p not derivable from the merge table")
      }
    }
  }
}
