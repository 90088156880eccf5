package graft

/** Driver-contract invariants: the shapes Verify/Bench and the DuckDB
  * oracle depend on. Catches drift (a renamed query orphaning its oracle
  * SQL, an undocumented rows-only query) at test time instead of in the
  * driver's correctness report.
  */
class ContractSpec extends SparkSpec {

  // queries with no SQL equivalent — each says why in its module scaladoc.
  // (q06/q84/q91 graduated off this list when they gained real oracles:
  // committed generator fixture, HUGEINT mod-2^64 emulation, ascii-
  // codepoint byte histogram; q22 graduated when its engine-specific HLL
  // value was replaced by the bounded-relative-error contract.)
  private val rowsOnlyByDesign = Set.empty[String]

  test("every oracle entry points at an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query is oracle-checked unless documented rows-only") {
    val unchecked = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(unchecked.isEmpty,
      s"queries silently missing an oracle: $unchecked")
    val stale = rowsOnlyByDesign -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only allowlist is stale: $stale")
    // reverse direction: an allowlisted query that HAS an oracle means the
    // allowlist is absorbing drift — if its oracle is later dropped, the
    // query would silently lose verification
    val absorbed = rowsOnlyByDesign intersect SparkEntry.oracleSql.keySet
    assert(absorbed.isEmpty,
      s"rows-only allowlist entries that actually have oracles: $absorbed")
  }

  test("oracle SQL never references absolute spark paths or temp dirs") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("/tmp/"), s"$name oracle depends on a temp path")
    }
  }

  test("documents corpus is ASCII (the q91 ascii-codepoint oracle invariant)") {
    // q91's DuckDB oracle rebuilds the fake decoder's BYTE histogram from
    // per-CHARACTER ascii() codepoints — equal only while every document
    // is pure ASCII (octet_length == char length). The invariant was
    // previously a comment in Multimodal.scala; this executes it, so a
    // future non-ASCII corpus fails loudly here instead of silently
    // diverging the oracle.
    import org.apache.spark.sql.functions._
    val nonAscii = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0L,
      s"$nonAscii non-ASCII documents would break q91's codepoint oracle")
  }
}
