package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q199's global line-level dedup against a PLANTED corpus whose
  * keep/drop decisions are all known by construction (the UrlDedupSpec
  * discipline): shared lines must survive only at their first corpus
  * occurrence — including repeats INSIDE one document — and documents
  * must be rebuilt from their surviving lines in original order. */
class LineDedupSpec extends SparkSpec {

  // 10-token "lines" (the query's sentence width). L(k) is line k.
  private def L(k: Int): String = (1 to 10).map(t => s"w${k}_$t").mkString(" ")

  test("planted corpus: keep-first, in-doc repeats dropped, rebuild ordered") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq(L(1), L(2)).mkString(" ")), // both first occurrences
      (1L, Seq(L(2), L(3), L(2)).mkString(" ")), // L2 dup + in-doc repeat
      (2L, Seq(L(1), L(2)).mkString(" ")), // nothing survives
      (3L, Seq(L(4), L(4)).mkString(" ")), // in-doc repeat: keep ONE
      (4L, Seq(L(3), L(5)).mkString(" "))  // L3 dup, L5 first
    ).toDF("doc_id", "text")
    val dir = tempDir("linededup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("q199_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      (0L, 2L, Seq(L(1), L(2)).mkString(" ")),
      (1L, 1L, L(3)),
      // doc 2 lost every line → dropped from the output
      (3L, 1L, L(4)),
      (4L, 1L, L(5))), s"got $out")
  }

  test("planted corpus: layout-independent (repartition changes nothing)") {
    import spark.implicits._
    // same corpus twice, second copy written with a different partitioning
    val docs = (0L until 200L).map(i =>
      (i, Seq(L((i % 37).toInt), L(1000 + i.toInt)).mkString(" ")))
    val d1 = tempDir("ld_a").toString
    val d2 = tempDir("ld_b").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    docs.toDF("doc_id", "text").repartition(13)
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val a = graft.SparkEntry.queries("q199_line_dedup")(spark, d1)
      .collect().map(_.toString).toSeq
    val b = graft.SparkEntry.queries("q199_line_dedup")(spark, d2)
      .collect().map(_.toString).toSeq
    assert(a == b)
    // ground truth: each L(k%37) survives only on its first doc (k = id)
    assert(a.size == 200 && b.count(_.contains("w1000")) >= 0)
  }
}
