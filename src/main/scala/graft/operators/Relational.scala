package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2 sections B–H) expressed as
  * named queries over the driver testdata. Each entry has a DuckDB oracle in
  * [[Relational.oracles]] with identical column names/aliases.
  *
  * Design rules (100 TB honesty):
  *   - declarative DataFrame chains only — Catalyst picks broadcast vs
  *     sort-merge, pushes filters into the parquet scan, prunes columns;
  *   - doubles that aggregate are rounded at the END of the query (both
  *     sides) so float summation order cannot flip the hash;
  *   - every result has a deterministic total order via an ORDER BY on a
  *     unique key prefix (oracle side mirrors it; harness may resort anyway).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped pricing summary: groupBy + multi-agg.
    * Capability: SURVEY §2 E2/E3 (groupBy count/agg) + B3 (derived cols).
    * Scale note: partial aggregation map-side, 6-row result — no skew risk.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** The literal string-SQL surfaces the reference leans on: a bare
    * SQL-string filter — `where("prediction = 1")`-shaped
    * (03-work with ML models.py:120) — and ordinal `GROUP BY 1 ORDER BY 1`
    * (01-rwe-dashboard.r:62-64). Both parse through the same Catalyst
    * analyzer as Column expressions, so plan quality is identical.
    */
  def qSqlStringSurface(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.orders
      .where("o_orderstatus = 'F' AND o_totalprice > 150000.0")
      .createOrReplaceTempView("graft_orders_filtered")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM graft_orders_filtered GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  def queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_sql_string_surface" -> (qSqlStringSurface _)
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_sql_string_surface" ->
      """SELECT o_orderpriority, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
