package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q117 JSONL ingest: the three malformed-line regimes and the corrupt
  * capture contract (the oracle already binds the aggregate truth; these
  * pin the reader semantics the aggregate rides on). */
class JsonlIngestSpec extends SparkSpec {

  private lazy val dir = JsonlIngest.stage(spark, sf0001)

  test("PERMISSIVE captures exactly the planted lines, verbatim, null-filled") {
    val df = JsonlIngest.readJsonl(spark, dir)
      .filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"), col("doc_id"), col("text"),
        col("source"), col("n_chars"))
      .collect()
    assert(df.length == JsonlIngest.NBadLines)
    assert(df.map(_.getString(0)).sorted.toSeq ==
      JsonlIngest.BadLines.sorted, "raw lines preserved verbatim")
    df.foreach { r =>
      (1 to 4).foreach(i => assert(r.isNullAt(i),
        s"corrupt row must null-fill data columns: $r"))
    }
  }

  test("no real line is misclassified; ids roundtrip through JSON exactly") {
    val parsed = JsonlIngest.readJsonl(spark, dir)
      .filter(col("_corrupt_record").isNull)
    val truth = graft.Tables.t(spark, sf0001, "documents")
    // count(doc_id), not count(*): a bare count after the corrupt-filter
    // prunes every DATA column away, and a scan referencing only the
    // internal corrupt column is unreadable by design (the quirk the main
    // query's one-pass group-by shape avoids)
    val ids = parsed
      .agg(count("doc_id"), min("doc_id"), max("doc_id"), sum("doc_id")).head
    val tids = truth
      .agg(count("doc_id"), min("doc_id"), max("doc_id"), sum("doc_id")).head
    assert(ids == tids, s"$ids vs $tids")
  }

  test("DROPMALFORMED shrinks silently; FAILFAST dies on the bad shard") {
    val n = spark.read.schema(JsonlIngest.DocSchema)
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/docs", s"$dir/docs_bad").count()
    assert(n == graft.Tables.t(spark, sf0001, "documents").count(),
      "DROPMALFORMED must drop exactly the planted lines")
    val e = intercept[Exception] {
      spark.read.schema(JsonlIngest.DocSchema)
        .option("mode", "FAILFAST")
        .json(s"$dir/docs_bad").collect()
    }
    assert(e.toString.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("malformed")),
      s"FAILFAST must surface the malformed record: $e")
  }

  test("stage is memoized: same corpus returns the same dir, no rewrite") {
    assert(JsonlIngest.stage(spark, sf0001) == dir)
    assert(JsonlIngest.stage(spark, sf0001 + "/.") == dir,
      "canonical-path keying: '/.' must not fork a second stage")
  }
}
