package graft.operators

import graft.SparkSpec

/** q328/q329's planted-truth gate: the hashed char-bigram NB must
  * actually RECOVER the planted language signal — accuracy and
  * per-language precision/recall against the cipher-planted truth, not
  * just hash-parity with the oracle (which would also pass for a
  * classifier that is deterministically wrong). */
class LangIdSpec extends SparkSpec {

  test("q329: planted cipher languages separate perfectly on the test split") {
    val rows = graft.SparkEntry
      .queries("q329_langid_classify")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val langs = Seq("de", "en", "es", "fr", "zh")
    val pairs = rows.map(r => (r.getAs[String]("lang_true"),
      r.getAs[String]("lang_pred")))
    val acc = pairs.count(p => p._1 == p._2).toDouble / pairs.length
    // the planted signal is a full alphabet permutation over ~50-130
    // word docs — hundreds of bigram instances per doc, so the NB
    // posterior separates completely; anything below 1.0 means the
    // feature hash, the smoothing or the argmax tie rule broke
    assert(acc == 1.0, s"accuracy $acc < 1.0 on planted cipher languages")
    langs.foreach { l =>
      val tp = pairs.count(p => p._1 == l && p._2 == l).toDouble
      val predicted = pairs.count(_._2 == l)
      val actual = pairs.count(_._1 == l)
      assert(actual > 0, s"test split lost language $l entirely")
      assert(tp / predicted == 1.0 && tp / actual == 1.0,
        s"$l: precision ${tp / predicted} recall ${tp / actual}")
    }
    info(s"accuracy $acc over ${pairs.length} test docs, 5 languages")
  }

  test("q328: the model grid is complete and smoothing-closed") {
    val m = graft.SparkEntry
      .queries("q328_langid_train")(spark, sf0001).collect()
    assert(m.length == 5 * TextAnalysis.LangIdB,
      s"model must be the full lang×bucket grid, got ${m.length}")
    // every weight is a negative log-likelihood in nanounits; unseen
    // buckets carry the add-one smoothing mass, never null/zero
    assert(m.forall(_.getAs[Long]("w_nano") < 0L))
  }
}
