package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality gate (Delta constraint / expectations
  * analogue; the reference relies on Delta's implicit schema checks —
  * this makes the contract explicit and distributed).
  *
  * Each rule is a named boolean Column; the report is ONE aggregate pass
  * computing violation counts for every rule simultaneously
  * (`sum(when(!rule))` columns share the scan and the single
  * HashAggregate), so adding rules never adds scans. `enforce` turns
  * violations into a hard failure for pipeline gating.
  */
object Quality {

  type Q = (SparkSession, String) => DataFrame

  /** One row per rule: violations + total + pass flag. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val agg = df.agg(
      count(lit(1)).as("__total"),
      rules.map { case (name, rule) =>
        // coalesce the SUM too: over zero rows it is NULL, which would
        // surface as violations=NULL / passed=NULL on an empty input
        coalesce(sum(when(!coalesce(rule, lit(false)), 1L).otherwise(0L)), lit(0L))
          .as(s"__v_$name")
      }: _*)
    // unpivot the single aggregate row to (rule, violations, total) rows —
    // Generate expand, no extra pass
    agg
      .unpivot(
        ids = Array(col("__total")),
        values = rules.map { case (n, _) => col(s"__v_$n") }.toArray,
        variableColumnName = "rule",
        valueColumnName = "violations")
      .select(
        regexp_replace(col("rule"), "^__v_", "").as("rule"),
        col("violations"),
        col("__total").as("total"),
        (col("violations") === 0).as("passed"))
      .orderBy(col("rule"))
  }

  /** Hard gate: throws if any rule has violations (count included). */
  def enforce(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val bad = report(df, rules).where(col("violations") > 0)
      .select(col("rule"), col("violations")).collect()
    require(bad.isEmpty,
      s"quality gate failed: ${bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")}")
    df
  }

  /** Declared query: constraint report over orders — null checks, domain
    * checks, range checks, cross-field checks, one scan for all six.
    */
  def qQualityChecks(spark: SparkSession, sfDir: String): DataFrame =
    report(
      Tables(spark, sfDir).orders,
      Seq(
        "orderkey_not_null" -> col("o_orderkey").isNotNull,
        "custkey_nonnegative" -> (col("o_custkey") >= 0),
        "status_in_domain" -> col("o_orderstatus").isin("F", "O", "P"),
        "price_positive" -> (col("o_totalprice") > 0),
        "price_below_cap" -> (col("o_totalprice") < 1000000),
        "date_in_range" -> col("o_orderdate").between("1990-01-01", "2030-01-01")
      ))

  def queries: Map[String, Q] = Map(
    "q_quality_checks" -> (qQualityChecks _)
  )

  def oracles: Map[String, String] = Map(
    "q_quality_checks" ->
      """WITH t AS (SELECT count(*) AS total,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, false) THEN 1 ELSE 0 END) AS BIGINT) AS orderkey_not_null,
        |  CAST(sum(CASE WHEN NOT coalesce(o_custkey >= 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nonnegative,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'), false) THEN 1 ELSE 0 END) AS BIGINT) AS status_in_domain,
        |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice < 1000000, false) THEN 1 ELSE 0 END) AS BIGINT) AS price_below_cap,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderdate BETWEEN '1990-01-01' AND '2030-01-01', false) THEN 1 ELSE 0 END) AS BIGINT) AS date_in_range
        |  FROM orders)
        |SELECT rule, violations, total, violations = 0 AS passed
        |FROM (
        |  SELECT 'orderkey_not_null' AS rule, orderkey_not_null AS violations, total FROM t
        |  UNION ALL SELECT 'custkey_nonnegative', custkey_nonnegative, total FROM t
        |  UNION ALL SELECT 'status_in_domain', status_in_domain, total FROM t
        |  UNION ALL SELECT 'price_positive', price_positive, total FROM t
        |  UNION ALL SELECT 'price_below_cap', price_below_cap, total FROM t
        |  UNION ALL SELECT 'date_in_range', date_in_range, total FROM t)
        |ORDER BY rule""".stripMargin
  )
}
