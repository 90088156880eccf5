package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: band a range join.
  *
  * An inner join whose condition contains `abs(x - y) <= w` (w a positive
  * literal, x from the left side, y from the right) is planned by Spark as
  * BroadcastNestedLoopJoin / CartesianProduct — O(|L|*|R|) comparisons,
  * which is exactly what dies first at scale. This rule rewrites it to the
  * standard binned form (same shape as the hand-written q17_range_join):
  *
  *   left:  bin_l = floor(x / w)
  *   right: bin_r exploded to {floor(y/w)-1, floor(y/w), floor(y/w)+1}
  *   join:  original equi-conjuncts AND bin_l = bin_r, then the original
  *          range predicate re-applied as a post-filter
  *
  * |x-y| <= w implies floor(x/w) is within 1 of floor(y/w), and exactly one
  * of the three exploded bins matches — so the rewrite preserves both the
  * result set AND multiplicity (no dedup needed). Catalyst then plans a
  * shuffled hash / sort-merge join on (equi-keys, bin).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) — the
  * whole-plan customization path (SURVEY §7: LogicalPlan Rule) demonstrated
  * on a rewrite that is genuinely load-bearing at 100 TB.
  *
  * Precondition: x and y are non-negative (epoch micros, ids...) or the
  * bin floor stays exact in double — values must stay within 2^52/w bins.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // STRUCTURAL fixpoint guard (round-7 verdict #1): the join is
        // already banded iff one of its equi-conjuncts references the
        // output of a banded explode ({b-1, b, b+1} Generate) in a child
        // subtree. This recognizes BOTH the rule's own output (after
        // PushPredicateThroughJoin folds the re-applied range filter back
        // into the join condition) AND a hand-binned join like q17's —
        // the former name-prefix guard ("graft_bin*") matched only the
        // rule's own columns, so a session carrying this rule re-banded
        // hand-binned plans (an extra ×3 explode; 2× measured on q17).
        if !alreadyBanded(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findRangePred(conjuncts, left, right) match {
        case Some((rangePred, x, y, w)) =>
          val others = conjuncts.filterNot(_ eq rangePred)
          // left: add bin_l
          val binL = Alias(binOf(x, w), "graft_bin_l")()
          val newLeft = Project(left.output :+ binL, left)
          // right: add exploded bins {b-1, b, b+1}
          val binR = binOf(y, w)
          val gen = Explode(CreateArray(Seq(
            Subtract(binR, Literal(1L)), binR, Add(binR, Literal(1L)))))
          val binROut = AttributeReference("graft_bin_r", LongType)()
          val newRight = Generate(gen, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(binROut), child = right)
          val newCond = (others :+
            EqualTo(binL.toAttribute, binROut)).reduce(And)
          val newJoin = Join(newLeft, newRight, Inner, Some(newCond), hint)
          // re-apply the exact range predicate, drop the helper columns
          Project(j.output, Filter(rangePred, newJoin))
        case None => j
      }
  }

  /** Literal 1 of any integral type (pre- or post-constant-folding). */
  private object One {
    def unapply(e: Expression): Boolean = e match {
      case Literal(1L, LongType) => true
      case Literal(1, _) => true
      case Cast(Literal(1, _), LongType, _, _) => true
      case _ => false
    }
  }

  /** Outputs of every banded explode ({b-1, b, b+1} over an array of 3)
    * in the subtree — the structural signature both the rule's own
    * rewrite and a hand-binned plan (q17) share. */
  private def bandedGenOutputs(plan: LogicalPlan): AttributeSet =
    AttributeSet(plan.collect {
      case g @ Generate(Explode(CreateArray(
          Seq(Subtract(_, One(), _), _, Add(_, One(), _)), _)), _, _, _, _, _) =>
        g.generatorOutput
    }.flatten)

  /** True iff an equi-conjunct of the join keys off a banded-explode
    * output — the join is already in the banded form, don't re-band. */
  private def alreadyBanded(j: Join): Boolean = {
    val banded = bandedGenOutputs(j.left) ++ bandedGenOutputs(j.right)
    banded.nonEmpty && j.condition.exists(c =>
      splitConjunctivePredicates(c).exists {
        case EqualTo(a: Attribute, b: Attribute) =>
          banded.contains(a) || banded.contains(b)
        case _ => false
      })
  }

  /** floor(x / w) as a long — exact for the documented domain. */
  private def binOf(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  /** Find `abs(x - y) <= w` with x/y split across the join sides. */
  private def findRangePred(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Long)] =
    conjuncts.collectFirst {
      case p @ LessThanOrEqual(Abs(Subtract(a, b, _), _), lit)
          if litAsPosLong(lit).isDefined && sided(a, b, left, right).isDefined =>
        val (x, y) = sided(a, b, left, right).get
        (p, x, y, litAsPosLong(lit).get)
    }

  private def litAsPosLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, _) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** Orient (a, b) as (from-left, from-right) if they split cleanly. */
  private def sided(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] = {
    val (la, ra) = (a.references.subsetOf(left.outputSet),
      a.references.subsetOf(right.outputSet))
    val (lb, rb) = (b.references.subsetOf(left.outputSet),
      b.references.subsetOf(right.outputSet))
    if (la && rb && a.references.nonEmpty && b.references.nonEmpty) Some((a, b))
    else if (ra && lb && a.references.nonEmpty && b.references.nonEmpty) Some((b, a))
    else None
  }
}
