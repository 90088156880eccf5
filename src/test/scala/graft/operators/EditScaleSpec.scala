package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EditScale's independent one-edit checker must agree with real edit
  * distance — it is the gate's precision judge, so a bug here would
  * silently bless a broken pipeline. Pinned against a from-scratch DP
  * Levenshtein over exhaustive small cases and seeded random pairs. */
class EditScaleSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("oneEdit == (levenshtein <= 1), exhaustive over tiny alphabet") {
    // every pair of strings of length 0..4 over {a, b}: 31^2 pairs —
    // covers equal, substitution, indel, swap (ed 2), disjoint
    val strs = (0 to 4).flatMap(n =>
      Seq.fill(n)(Seq("a", "b")).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(s => cs.map(s + _))))
    for (x <- strs; y <- strs)
      assert(EditScale.oneEdit(x, y) == (lev(x, y) <= 1),
        s"oneEdit('$x','$y') disagrees with levenshtein ${lev(x, y)}")
  }

  test("oneEdit == (levenshtein <= 1), seeded random word pairs") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (1 to 5 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 2000) {
      val a = word()
      // bias toward near pairs: mutate a half the time
      val b = if (rnd.nextBoolean()) word() else {
        val k = rnd.nextInt(a.length)
        rnd.nextInt(3) match {
          case 0 => a.substring(0, k) + a.substring(math.min(k + 1, a.length))
          case 1 => a.substring(0, k) + ('a' + rnd.nextInt(4)).toChar + a.substring(k)
          case _ => a.updated(k, ('a' + rnd.nextInt(4)).toChar)
        }
      }
      assert(EditScale.oneEdit(a, b) == (lev(a, b) <= 1),
        s"oneEdit('$a','$b') disagrees with levenshtein ${lev(a, b)}")
    }
  }
}
