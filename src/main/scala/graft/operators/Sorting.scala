package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sort / limit / top-k coverage (SURVEY §2 F-rows).
  *
  * `orderBy(...).limit(k)` collapses to TakeOrderedAndProject — per-partition
  * top-k heaps then a driver merge of k×partitions rows, never a global sort.
  * That is the only top-k shape that survives 100 TB; the plan is asserted in
  * PlanSpec.
  */
object Sorting {

  type Q = (SparkSession, String) => DataFrame

  /** Top-k with tiebreaker (F1). Reference: top-k conditions,
    * 01-rwe-dashboard.r:31-35. Tiebreak on the unique key keeps the result
    * deterministic (SURVEY §5.2 determinism rule).
    */
  def topParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(20)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))

  /** min via sort+limit(1) (F2). Reference: lowest_date,
    * 02-patient-trajectory.py:101-107. Projecting only the sort key makes
    * ties harmless. Equivalence with agg(min) is pinned in ScalaTest.
    */
  def firstOrderDate(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .orderBy(col("o_orderdate").asc)
      .limit(1)
      .select(col("o_orderdate").as("first_date"))

  /** Ordered limit page (F3 made deterministic: reference uses bare
    * limit(n) at 02:77 — non-deterministic, so the declared query adds the
    * full-key order the harness requires).
    */
  def orderPage(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  def queries: Map[String, Q] = Map(
    "q_topk_parts" -> (topParts _),
    "q_min_sortlimit" -> (firstOrderDate _),
    "q_order_page" -> (orderPage _)
  )

  def oracles: Map[String, String] = Map(
    "q_topk_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 20""".stripMargin,
    "q_min_sortlimit" ->
      "SELECT o_orderdate AS first_date FROM orders ORDER BY o_orderdate LIMIT 1",
    "q_order_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin
  )
}
