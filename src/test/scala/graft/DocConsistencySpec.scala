package graft

/** Docs-vs-code consistency: the README's suite count drifted two rounds
  * in a row when hand-written (round-6 fix #7, round-7 verdict #3). Now
  * the README carries a machine-checked `SUITE_COUNT: N` marker and this
  * spec fails the build whenever N != SparkEntry.queries.size — the only
  * way to add a query is to bump the README in the same change. */
class DocConsistencySpec extends SparkSpec {

  test("README SUITE_COUNT matches SparkEntry.queries.size") {
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val m = "SUITE_COUNT: (\\d+)".r.findAllMatchIn(readme).toSeq
    assert(m.size == 1, "README must contain exactly one SUITE_COUNT marker")
    assert(m.head.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.head.group(1)} queries, " +
        s"SparkEntry.queries has ${SparkEntry.queries.size} — " +
        "update the README SUITE_COUNT in the same change")
  }

  test("every query has an oracle or a documented rows-only status") {
    // every queries entry should have oracleSql; the driver records a
    // weaker rows-only check for missing ones — keep that set empty
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle SQL (rows-only fallback): $missing")
  }
}
