package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects cosine_sim/rolling_hash via session config") {
    // force a fresh session (same SparkContext) so extensions apply
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val h = s.sql("SELECT rolling_hash('abc') AS h").collect().head.getLong(0)
      assert(h == 96354L)
      val c = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c"""
          .stripMargin).collect().head.getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val brc = s.sql(
        "SELECT brc_station('Oslo;-3.7') AS st, brc_tenths('Oslo;-3.7') AS t, " +
          "brc_parse('Oslo;-3.7').measure AS m").collect().head
      assert(brc.getString(0) == "Oslo" && brc.getLong(1) == -37L
        && brc.getDouble(2) == -3.7)
      // kmv_sketch: injected, works on strings, REJECTS non-string input
      // at analysis time (hashing an internal value's toString would
      // silently disagree with any md5(CAST(x AS STRING)) oracle)
      val est = s.sql("SELECT kmv_sketch(CAST(id AS STRING)) AS e FROM range(10)")
        .collect().head.getDouble(0)
      assert(est == 10.0) // below k=64 -> exact
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT kmv_sketch(id) FROM range(10)").collect()
      }
      assert(err.getMessage.contains("STRING"))
      // freq_sketch: injected; below K distinct the sketch is exact
      val fs = s.sql(
        "SELECT freq_sketch(CAST(id % 3 AS STRING)) AS m FROM range(9)")
        .collect().head.getMap[String, Long](0)
      assert(Seq("0", "1", "2").forall(k => fs.get(k).contains(3L)))
      val ferr = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT freq_sketch(id) FROM range(10)").collect()
      }
      assert(ferr.getMessage.contains("STRING"))
      // bloom_agg/might_contain: Spark's runtime-filter pair, injected as
      // SQL — the bloom side must be a scalar subquery (or foldable), and
      // membership has no false negatives
      // png_ihdr / wav_fmt: injected media-header decoders reject junk
      val media = s.sql(
        "SELECT png_ihdr(CAST('junk' AS BINARY)) AS p, " +
          "wav_fmt(CAST('junk' AS BINARY)) AS w").collect().head
      assert(media.isNullAt(0) && media.isNullAt(1))
      s.range(0, 100).createOrReplaceTempView("bloom_keys")
      val hits = s.sql(
        """SELECT count(*) AS n FROM range(200)
          |WHERE might_contain(
          |  (SELECT bloom_agg(xxhash64(id)) FROM bloom_keys),
          |  xxhash64(id))""".stripMargin).collect().head.getLong(0)
      assert(hits >= 100 && hits <= 110, // all members + bounded FPs
        s"bloom admitted $hits of 200 (100 true members)")
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
