package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q138 XML ingest: the roundtrip must be byte-faithful through the
  * escape→parse cycle, and the markup-hostile path (`&<>"'`) — absent
  * from the generated corpus — is pinned here with explicit fixtures.
  */
class XmlIngestSpec extends SparkSpec {

  test("q138: XML roundtrip preserves every row and every text byte") {
    val dir = XmlStage.stage(spark, sf0001)
    val xml = XmlStage.readXml(spark, dir)
    val docs = graft.Tables.t(spark, sf0001, "documents")
    assert(xml.count() == docs.count())
    // full-text equality per doc_id, not just the 16-bit signature
    val joined = xml.as("x").join(docs.as("p"), "doc_id")
      .select(col("x.text") === col("p.text"),
        col("x.lang") === col("p.lang"),
        col("x.source") === col("p.source"),
        col("x.n_chars") === col("p.n_chars"))
    assert(joined.collect().forall(r => (0 to 3).forall(r.getBoolean)))
  }

  test("XML escaping: markup characters and multiline text survive") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "a & b < c > d \"quoted\" 'apos'", "en", "fixture", 29L),
      (2L, "line one\nline two & <tag>final</tag>", "en", "fixture", 36L),
      (3L, "]]> cdata-terminator &amp; pre-escaped", "en", "fixture", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("graft-xml-hostile-").toString
    hostile.write.mode("overwrite")
      .option("rootTag", "corpus").option("rowTag", "doc")
      .format("xml").save(s"$dir/docs")
    val back = spark.read.schema(OrcStage.DocSchema)
      .option("rowTag", "doc").format("xml").load(s"$dir/docs")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = hostile.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want, s"escape roundtrip mismatch: $back")
  }
}
