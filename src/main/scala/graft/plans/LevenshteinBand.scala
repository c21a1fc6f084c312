package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite bounded edit-distance predicates to
  * Spark's THRESHOLDED Levenshtein.
  *
  * `levenshtein(a, b) <= k` forces the full O(|a|·|b|) dynamic program on
  * every candidate pair; Spark's 3-argument `levenshtein(a, b, k)`
  * evaluates the banded O(k·min(|a|,|b|)) DP, bails out on the
  * |len(a)−len(b)| > k fast path, and encodes "over budget" as −1. For a
  * record-linkage join ([[graft.ops.Similarity.qFuzzyJoin]]) the verify
  * predicate dominates the block self-join's cost, so the rewrite is the
  * difference between O(k·n) and O(n²) per comparison at 100 TB — and it
  * belongs in the OPTIMIZER, not in user code: any query that spells the
  * natural `levenshtein(a,b) BETWEEN lo AND hi` gets the banded plan for
  * free.
  *
  * Soundness: within one Filter's conjunction, let `hi` be the tightest
  * upper bound on a given (canonicalized) un-thresholded Levenshtein.
  * Writing `levT = levenshtein(a, b, hi)`:
  *  - if lev ≤ hi, then levT = lev, so every comparison on lev holds iff
  *    the same comparison on levT does (and the added `levT >= 0` holds);
  *  - if lev > hi, the original conjunction is false via its upper bound,
  *    and the rewritten one is false via the added `levT >= 0` (levT=−1);
  *  - if either input is null both sides are null → row filtered.
  * So substituting levT for lev across the group's conjuncts and
  * prepending `levT >= 0` (first, so codegen short-circuits the cheap
  * test) preserves the filter row-for-row. The rewrite aborts if the lev
  * occurs anywhere outside simple literal comparisons at the top level of
  * the conjunction (e.g. under an OR), and only fires on un-thresholded
  * expressions, so it is idempotent under the optimizer's fixpoint batch.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (lev, upper-bound-if-this-conjunct-caps-it, rewritten-form builder).
    * Returns the bare Levenshtein compared, the effective upper bound the
    * conjunct implies (None for pure lower bounds), and a function from
    * the thresholded replacement to the rewritten conjunct. */
  private def asBound(e: Expression)
      : Option[(Levenshtein, Option[Int], Expression => Expression)] = e match {
    case LessThanOrEqual(l @ Levenshtein(_, _, None), lit @ Literal(k: Int, IntegerType)) =>
      Some((l, Some(k), t => LessThanOrEqual(t, lit)))
    case LessThan(l @ Levenshtein(_, _, None), lit @ Literal(k: Int, IntegerType)) =>
      Some((l, Some(k - 1), t => LessThan(t, lit)))
    case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None)) =>
      Some((l, Some(k), t => GreaterThanOrEqual(lit, t)))
    case GreaterThan(lit @ Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None)) =>
      Some((l, Some(k - 1), t => GreaterThan(lit, t)))
    case EqualTo(l @ Levenshtein(_, _, None), lit @ Literal(k: Int, IntegerType)) =>
      Some((l, Some(k), t => EqualTo(t, lit)))
    case EqualTo(lit @ Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None)) =>
      Some((l, Some(k), t => EqualTo(lit, t)))
    case GreaterThanOrEqual(l @ Levenshtein(_, _, None), lit @ Literal(_: Int, IntegerType)) =>
      Some((l, None, t => GreaterThanOrEqual(t, lit)))
    case GreaterThan(l @ Levenshtein(_, _, None), lit @ Literal(_: Int, IntegerType)) =>
      Some((l, None, t => GreaterThan(t, lit)))
    case LessThanOrEqual(lit @ Literal(_: Int, IntegerType), l @ Levenshtein(_, _, None)) =>
      Some((l, None, t => LessThanOrEqual(lit, t)))
    case LessThan(lit @ Literal(_: Int, IntegerType), l @ Levenshtein(_, _, None)) =>
      Some((l, None, t => LessThan(lit, t)))
    case _ => None
  }

  private def containsLev(e: Expression, l: Levenshtein): Boolean =
    e.exists(_.semanticEquals(l))

  /** Rewrite a full predicate (a Filter or Join condition — contexts
    * where the 3-valued truth value of the WHOLE conjunction is what
    * matters). Returns None when nothing qualified. */
  private def rewriteConjunction(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = conjuncts.map(c => c -> asBound(c))
    // group the bound conjuncts by the Levenshtein they compare
    val groups = bounds.collect { case (c, Some(b)) => (c, b) }
      .groupBy { case (_, (l, _, _)) => l.canonicalized }
    var rewritten = Map.empty[Expression, Expression] // conjunct -> new
    var prepend = List.empty[Expression]
    groups.foreach { case (_, grp) =>
      val lev = grp.head._2._1
      val his = grp.flatMap { case (_, (_, hi, _)) => hi }
      // need a non-negative cap, and the lev must not appear in any
      // conjunct we can't rewrite (an OR arm, a projection-like use)
      val others = conjuncts.filterNot(c => grp.exists(_._1 eq c))
      if (his.nonEmpty && his.min >= 0 && !others.exists(containsLev(_, lev))) {
        val hi = his.min
        val levT = Levenshtein(lev.left, lev.right, Some(Literal(hi)))
        grp.foreach { case (c, (_, _, rebuild)) => rewritten += (c -> rebuild(levT)) }
        prepend ::= GreaterThanOrEqual(levT, Literal(0))
      }
    }
    if (rewritten.isEmpty) None
    else {
      val body = conjuncts.map(c => rewritten.getOrElse(c, c))
      Some((prepend ++ body).reduceLeft(And))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewriteConjunction(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewriteConjunction(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
