package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Expression, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** SQL spellings for the recursive trend smoothers (`ewma`, `holt_smooth`).
  *
  * [[graft.analytics.Behavior.ewmaDaily]] and
  * [[graft.analytics.Behavior.holtTrend]] run the genuinely-recursive
  * smoothing folds (no window frame expresses EWMA_t = α·x_t +
  * (1-α)·EWMA_{t-1}) through the `aggregate` higher-order function — but
  * only as DataFrame code. These builders give pure-SQL users the same
  * folds as functions over an array column, completing the
  * "SQL user reaches everything" contract the lake DML surface already
  * establishes (the reference drives everything through notebook SQL
  * cells, 01-rwe-dashboard.r:30-44).
  *
  * Each builder EXPANDS to the exact `aggregate` composition the
  * DataFrame path runs — the same Catalyst nodes, the same left fold,
  * the same first-element seed — so the two spellings are bit-identical
  * by construction, stay inside whole-stage codegen, and need no new
  * evaluation code at all. The expansion parses a SQL template once and
  * splices the caller's argument expressions in for the placeholder
  * attributes (the placeholders can never collide with user columns:
  * they are substituted before analysis ever sees them).
  *
  * Scale shape: both functions are per-row scalar folds over an
  * already-aggregated bounded series (days per key, not events) — the
  * corpus-sized shuffle happens in the caller's pre-aggregate, exactly
  * as in the DataFrame twins.
  */
object Smoothers {

  /** Parse `template` and replace each placeholder attribute with the
    * caller's expression. Substitution runs on the UNRESOLVED tree;
    * inside a lambda body the parser wraps every identifier as
    * [[UnresolvedNamedLambdaVariable]] (not [[UnresolvedAttribute]]), so
    * both spellings of a placeholder are matched. The real lambda
    * variables (`acc`, `x`) are not placeholder names and stay untouched
    * for the analyzer's normal higher-order-function resolution.
    */
  private def expand(template: String, subs: Map[String, Expression]): Expression =
    CatalystSqlParser.parseExpression(template).transformUp {
      case a: UnresolvedAttribute if subs.contains(a.name) => subs(a.name)
      case v: UnresolvedNamedLambdaVariable
          if v.nameParts.length == 1 && subs.contains(v.nameParts.head) =>
        subs(v.nameParts.head)
    }

  /** `ewma(vs, alpha)` — exponentially-weighted moving average of the
    * DOUBLE series `vs` (oldest first), seeded with the first element:
    * EWMA_1 = vs[1]; EWMA_t = α·vs[t] + (1-α)·EWMA_{t-1}. NULL for a
    * NULL or empty array. `alpha` may be any double expression
    * (typically a literal); it is spliced into the fold lambda, where a
    * non-literal resolves as a captured outer reference.
    */
  def ewma(vs: Expression, alpha: Expression): Expression =
    expand(
      """CASE WHEN __graft_vs IS NULL OR size(__graft_vs) = 0
        |     THEN CAST(NULL AS DOUBLE)
        |     ELSE aggregate(
        |       slice(__graft_vs, 2, size(__graft_vs) - 1),
        |       CAST(element_at(__graft_vs, 1) AS DOUBLE),
        |       (acc, x) -> CAST(__graft_a AS DOUBLE) * CAST(x AS DOUBLE)
        |                   + (CAST(1.0 AS DOUBLE) - CAST(__graft_a AS DOUBLE)) * acc)
        |END""".stripMargin,
      Map("__graft_vs" -> vs, "__graft_a" -> alpha))

  /** `holt_smooth(vs, alpha, gamma)` — Holt's linear-trend smoothing of
    * the DOUBLE series `vs` (oldest first): the coupled level/trend
    * double recursion l_t = α·x_t + (1-α)(l_{t-1} + b_{t-1}),
    * b_t = γ(l_t - l_{t-1}) + (1-γ)·b_{t-1}, seeded l_1 = vs[1],
    * b_1 = 0. Returns STRUCT<level: DOUBLE, trend: DOUBLE> (the h-step
    * forecast is `level + h * trend`); NULL for a NULL or empty array.
    */
  def holtSmooth(vs: Expression, alpha: Expression, gamma: Expression): Expression =
    expand(
      """CASE WHEN __graft_vs IS NULL OR size(__graft_vs) = 0
        |     THEN CAST(NULL AS STRUCT<level: DOUBLE, trend: DOUBLE>)
        |     ELSE aggregate(
        |       slice(__graft_vs, 2, size(__graft_vs) - 1),
        |       named_struct('level', CAST(element_at(__graft_vs, 1) AS DOUBLE),
        |                    'trend', CAST(0.0 AS DOUBLE)),
        |       (acc, x) -> named_struct(
        |         'level', CAST(__graft_a AS DOUBLE) * CAST(x AS DOUBLE)
        |                  + (CAST(1.0 AS DOUBLE) - CAST(__graft_a AS DOUBLE))
        |                    * (acc.level + acc.trend),
        |         'trend', CAST(__graft_g AS DOUBLE)
        |                  * ((CAST(__graft_a AS DOUBLE) * CAST(x AS DOUBLE)
        |                      + (CAST(1.0 AS DOUBLE) - CAST(__graft_a AS DOUBLE))
        |                        * (acc.level + acc.trend)) - acc.level)
        |                  + (CAST(1.0 AS DOUBLE) - CAST(__graft_g AS DOUBLE)) * acc.trend))
        |END""".stripMargin,
      Map("__graft_vs" -> vs, "__graft_a" -> alpha, "__graft_g" -> gamma))
}
