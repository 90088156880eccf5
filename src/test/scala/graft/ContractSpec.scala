package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the shapes Verify/Bench and the DuckDB
  * oracle depend on. Catches drift (a renamed query orphaning its oracle
  * SQL, an undocumented rows-only query) at test time instead of in the
  * driver's correctness report.
  */
class ContractSpec extends AnyFunSuite {

  // queries with no SQL equivalent — each says why in its module scaladoc
  private val rowsOnlyByDesign = Set(
    "q06_generator",            // seeded RNG differs across engines
    "q22_approx_distinct",      // HLL sketch values are engine-specific
    "q84_rolling_fp",           // 64-bit wrapping arith not in DuckDB SQL
    "q91_multimodal_features")  // fake decoder has no SQL equivalent

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
  }

  test("oracle SQL never references absolute spark paths or temp dirs") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("/tmp/"), s"$name oracle depends on a temp path")
    }
  }
}
