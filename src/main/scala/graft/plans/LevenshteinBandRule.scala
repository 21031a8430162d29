package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: prepend a cheap length-band guard to Levenshtein
  * threshold predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (every length difference costs at least one edit), and the guard is
  * O(len) while the Levenshtein DP is O(len²). Rewriting
  * `lev <= k` to `band AND lev <= k` lets codegen's short-circuit skip
  * the DP for every candidate pair whose lengths already rule it out —
  * on fuzzy self-joins that is most of the cross product. This is the
  * classic length-filter from similarity-join literature (e.g. ED-Join),
  * expressed as a `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions` ([[graft.core.GraftExtensions]]) so it
  * applies to SQL and DataFrame plans alike.
  *
  * The rule runs inside the operator-optimization fixed-point batch, so
  * it must be idempotent: a predicate already carrying its guard is left
  * untouched.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  /** levenshtein(a,b), possibly cast (e.g. to bigint for oracle parity),
    * without a built-in threshold (3-arg levenshtein already bounds its
    * own DP cost — banding it again would be redundant).
    */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case Cast(Levenshtein(a, b, None), _, _, _) => Some((a, b))
      case _ => None
    }
  }

  /** `lev(a,b) <= k` / `lev(a,b) < k` / reversed, with a literal bound.
    * Returns the operands and the INCLUSIVE bound.
    */
  private object LevThreshold {
    private def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(Lev(a, b), k) => lit(k).map(v => (a, b, v))
      case LessThan(Lev(a, b), k) => lit(k).map(v => (a, b, v - 1))
      case GreaterThanOrEqual(k, Lev(a, b)) => lit(k).map(v => (a, b, v))
      case GreaterThan(k, Lev(a, b)) => lit(k).map(v => (a, b, v - 1))
      case _ => None
    }
  }

  private def guard(a: Expression, b: Expression, k: Long): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k.toInt))

  private def isGuardFor(e: Expression, a: Expression, b: Expression): Boolean = e match {
    case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
      (x.semanticEquals(a) && y.semanticEquals(b)) ||
        (x.semanticEquals(b) && y.semanticEquals(a))
    case _ => false
  }

  private def band(cond: Expression): Expression = cond.transformUp {
    // k above Int range can't band (toInt would wrap negative and turn
    // the guard into `false`, changing results) — and such a threshold
    // never prunes anyway
    case t @ LevThreshold(a, b, k)
        if k >= 0 && k <= Int.MaxValue && !cond.exists(isGuardFor(_, a, b)) =>
      And(guard(a, b, k), t)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val banded = band(cond)
      if (banded.fastEquals(cond)) f else f.copy(condition = banded)
    case j @ Join(_, _, _, Some(cond), _) =>
      val banded = band(cond)
      if (banded.fastEquals(cond)) j else j.copy(condition = Some(banded))
  }
}
