package graft

/** Bench stdout-line budget, pinned at build time.
  *
  * Round-11 lesson (verdict #1): the bench headline auto-includes every
  * query id above the curated max, and round 11 added 42 queries without
  * promoting any — the 104-entry auto-tail grew the stdout line to 1972
  * chars, `Bench`'s own `require(< 1750)` killed the JVM with rc=1, and
  * EVERY full-suite bench run of the round (the driver's BENCH_r11
  * included) crashed after writing bench_out.json. The crash was invisible
  * because totals were quoted from the file without checking the exit
  * code. This spec recomputes the worst-case stdout line for the CURRENT
  * suite on every build, so suite growth trips a red test at edit time
  * instead of a dead driver artifact at round end.
  */
class BenchHeadlineSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("worst-case bench stdout line fits the driver capture guard") {
    val len = Bench.worstCaseStdoutLen(names)
    assert(len < Bench.stdoutGuard,
      s"bench stdout line would be $len chars >= guard ${Bench.stdoutGuard} " +
        "at worst-case widths — promote this round's keepers into " +
        "Bench.curatedHeadline (raising its max id) and/or prune family " +
        "duplicates, exactly as Bench.scala's curated-list comment says")
  }

  test("curated headline names are real suite queries") {
    // a renamed/retired query would silently drop out of the stdout line
    // (filter semantics) — fail the build instead
    val unknown = Bench.curatedHeadline.filterNot(SparkEntry.queries.keySet)
    assert(unknown.isEmpty,
      s"Bench.curatedHeadline references unknown queries: ${unknown.mkString(",")}")
  }

  test("headline covers every query above the curated max (auto-add invariant)") {
    val head = Bench.headlineSet(names)
    def qid(n: String): Int =
      "q(\\d+)".r.findFirstMatchIn(n).map(_.group(1).toInt).getOrElse(-1)
    val maxCurated = Bench.curatedHeadline.map(qid).max
    val missed = names.filter(n => qid(n) > maxCurated && !head(n))
    assert(missed.isEmpty, s"auto-add failed to include: ${missed.mkString(",")}")
  }
}
