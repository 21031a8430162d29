package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Statistical special functions the engine needs but Spark lacks —
  * currently the chi-square survival function (p-value), so
  * [[graft.analytics.Cohort.chiSquare]] can return the full
  * `chisq.test`-shaped result the reference prints
  * (01-rwe-dashboard.r:109-124).
  *
  * The regularized incomplete gamma is implemented from the standard
  * series / continued-fraction split (Abramowitz & Stegun §6.5; the
  * modified-Lentz evaluation of the continued fraction): series for
  * x < a+1, continued fraction otherwise — each convergent to ~1e-15
  * relative where it is used. Public textbook numerics, no dependencies.
  */
object Stats {

  /** ln Γ(x) via the Lanczos approximation (g=7, 9 coefficients). */
  def lnGamma(x: Double): Double = {
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection for the (unused here) left half-plane
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    } else {
      val xx = x - 1.0
      var a = c(0)
      var i = 1
      while (i < c.length) { a += c(i) / (xx + i); i += 1 }
      val t = xx + 7.5
      0.5 * math.log(2.0 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Lower regularized incomplete gamma P(a,x) by its power series
    * (converges fast for x < a+1).
    */
  private def gammaPSeries(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 1000 && math.abs(del) >= math.abs(sum) * 1e-16) {
      ap += 1.0
      del *= x / ap
      sum += del
      n += 1
    }
    sum * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  /** Upper regularized incomplete gamma Q(a,x) by modified-Lentz
    * continued fraction (converges fast for x >= a+1).
    */
  private def gammaQContinuedFraction(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    while (i < 1000 && {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      del = d * c
      h *= del
      math.abs(del - 1.0) > 1e-16
    }) i += 1
    math.exp(-x + a * math.log(x) - lnGamma(a)) * h
  }

  /** Chi-square survival function: P[X >= chi2] for X ~ ChiSq(dof).
    * This is the p-value of a Pearson chi-square test.
    * NaN for dof <= 0; 1.0 for chi2 <= 0.
    */
  def chiSqSurvival(chi2: Double, dof: Double): Double = {
    if (dof <= 0.0 || chi2.isNaN || dof.isNaN) Double.NaN
    else if (chi2 <= 0.0) 1.0
    else {
      val a = dof / 2.0
      val x = chi2 / 2.0
      // take whichever branch evaluates Q directly with best precision
      if (x < a + 1.0) 1.0 - gammaPSeries(a, x)
      else gammaQContinuedFraction(a, x)
    }
  }

  /** Column form: chi-square p-value from (statistic, dof). Applied to
    * 1-row aggregate outputs — interpreted eval (CodegenFallback) is
    * deliberate; this is never in a per-row hot path.
    */
  def chiSqPValue(chi2: Column, dof: Column): Column =
    GraftBridge.column(ChiSqPValueExpr(
      GraftBridge.expression(chi2.cast("double")),
      GraftBridge.expression(dof.cast("double"))))
}

/** p-value of a chi-square statistic: survival function at (chi2, dof). */
case class ChiSqPValueExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "chisq_pvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"expected (double, double), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(chi2: Any, dof: Any): Any =
    Stats.chiSqSurvival(chi2.asInstanceOf[Double], dof.asInstanceOf[Double])

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
