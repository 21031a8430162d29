package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Set-operation coverage (SURVEY §2 G1 + extensions). */
object SetOps {

  type Q = (SparkSession, String) => DataFrame

  /** union (bag semantics, duplicates kept — G1). Reference: cases ∪
    * controls cohort, 02-patient-trajectory.py:82. A customer matching both
    * filters appears twice, exactly like the reference's union.
    */
  def unionSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val building = t.customer.where(col("c_mktsegment") === "BUILDING")
    val rich = t.customer.where(col("c_acctbal") > 5000)
    building
      .union(rich)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))
  }

  /** except (distinct semantics; extension). */
  def inactiveCustkeys(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    // except against urgent-order custkeys (all custkeys appear in orders,
    // so except-ing the full set would be a vacuous 0-row check)
    t.customer
      .select(col("c_custkey").as("custkey"))
      .except(
        t.orders.where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
      )
      .orderBy(col("custkey"))
  }

  /** intersect (distinct semantics; extension). */
  def activeCustkeys(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.customer
      .select(col("c_custkey").as("custkey"))
      .intersect(t.orders.select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  def queries: Map[String, Q] = Map(
    "q_union_bag" -> (unionSegments _),
    "q_except" -> (inactiveCustkeys _),
    "q_intersect" -> (activeCustkeys _)
  )

  def oracles: Map[String, String] = Map(
    "q_union_bag" ->
      """SELECT c_nationkey, count(*) AS n FROM (
        |  SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT * FROM customer WHERE c_acctbal > 5000
        |) GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin
  )
}
