package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q198's URL/domain dedup against a PLANTED ground truth (the DedupScale
  * discipline at spec scale): a synthetic crawl whose canonical groups,
  * keepers, duplicate counts and per-domain loads are all known by
  * construction — including one heavy domain far above the cap — so
  * every contract of the gate is checked independently of the pipeline
  * that computes it.
  *
  * Corpus: 580 URL groups. Group g carries 1 + (g % 3) surface forms
  * (scheme/www/port/utm/fragment/trailing-slash/case noise), doc_ids
  * {10g, 10g+1, 10g+2}. Groups g < 300 live on heavy.com (300 keepers ≫
  * cap); the rest spread over 40 .org domains (7 keepers each, under
  * cap). Expected keeper set per domain is recomputed in the spec with
  * java.security MessageDigest — independent of Spark's md5.
  */
class UrlDedupSpec extends SparkSpec {

  private def plantedDocs = spark.range(0, 580).toDF("g")
    .selectExpr("g",
      "CASE WHEN g < 300 THEN 'heavy.com' " +
        "ELSE 'site' || CAST(g % 40 AS STRING) || '.org' END AS dom")
    .withColumn("f", explode(expr("sequence(0, g % 3)")))
    .selectExpr("g * 10 + f AS doc_id", "g", "dom", "f")
    .withColumn("url", expr(
      """CASE f
        |  WHEN 0 THEN 'https://' || dom || '/p/' || g || '?id=' || (g % 97)
        |  WHEN 1 THEN 'http://www.' || upper(dom) || ':80/p/' || g ||
        |              '/?id=' || (g % 97) || '&utm_source=x'
        |  ELSE 'https://' || dom || '/p/' || g ||
        |       '?utm_a=1&id=' || (g % 97) || '#frag'
        |END""".stripMargin))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted crawl: keepers, dup counts, canonical forms all exact") {
    val out = Dedup.urlDedupCapped(spark, plantedDocs.select("doc_id", "url"))
      .collect()
    // per-domain: heavy.com capped, each .org domain keeps all 7
    val byDomain = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byDomain("heavy.com") == Dedup.DomainCap,
      s"heavy domain must be cut to the cap: $byDomain")
    assert((0 until 40).forall(k => byDomain(s"site$k.org") == 7))
    assert(out.length == Dedup.DomainCap + 280)

    out.foreach { r =>
      val (docId, canon, dom, nDups, _) = (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4))
      val g = docId / 10
      assert(docId % 10 == 0, s"keeper must be the min doc_id of its group: $r")
      assert(nDups == 1 + g % 3, s"dup count must match planted forms: $r")
      assert(canon == s"https://$dom/p/$g?id=${g % 97}",
        s"canonicalization must collapse every surface form: $r")
    }

    // heavy.com's kept keepers = the cap smallest by the salted md5 rank,
    // recomputed here with MessageDigest (not Spark)
    val expectedHeavy = (0L until 300L).map(_ * 10)
      .sortBy(id => (md5hex(s"cap_$id"), id)).take(Dedup.DomainCap).toSet
    val gotHeavy = out.filter(_.getString(2) == "heavy.com")
      .map(_.getLong(0)).toSet
    assert(gotHeavy == expectedHeavy,
      "cap must keep exactly the hash-rank winners")
  }

  test("planted crawl: output is layout-independent (repartition ≠ answer)") {
    val a = Dedup.urlDedupCapped(spark, plantedDocs.select("doc_id", "url"))
      .collect().map(_.toString).toSeq
    val b = Dedup.urlDedupCapped(spark,
        plantedDocs.select("doc_id", "url").repartition(7))
      .collect().map(_.toString).toSeq
    assert(a == b, "hash ranking must be deterministic across layouts")
  }
}
