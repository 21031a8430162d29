package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Join coverage (SURVEY §2 D-rows + extension join types).
  *
  * Scale design: fact-to-fact joins (lineitem ⋈ orders) shuffle on the join
  * key — unavoidable, but AQE handles skew. Dimension joins (nation, region,
  * customer at dim-scale) are explicitly `broadcast()` so the 100 TB fact
  * side never shuffles for them. The 1-row scalar "join" is a broadcast
  * nested-loop by construction.
  */
object Joins {

  type Q = (SparkSession, String) => DataFrame

  /** 3-way star join, fact ⋈ fact ⋈ dim (D1). Reference shape: the
    * patient_encounters star at 00-etl-rwd.py:136-141.
    * customer is a dimension -> broadcast; lineitem⋈orders shuffles on
    * orderkey (both sides huge at scale, sort-merge is correct).
    */
  def revenueBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("c_mktsegment"))
  }

  /** Equi-join via explicit column expression (D2), dims broadcast.
    * Reference shape: joinExpr at 01-rwe-dashboard.r:80-81.
    */
  def supplierByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal")
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-outer join with count-of-nonnull (D3). Reference: patients ×
    * condition flags at 01-rwe-dashboard.r:110.
    */
  def ordersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (D4). Reference: negative controls (patients WITHOUT the
    * condition) at 02-patient-trajectory.py:73-79.
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    // anti against the 'P'-status subset: every customer has SOME order in
    // this data, so anti-joining all orders would be a vacuous 0-row check
    t.customer
      .join(
        t.orders.where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join (extension; EXISTS). */
  def activeCustomersBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** Cross join against a 1-row aggregate = broadcast scalar (D5).
    * Reference: lowest_date crossJoin at 02-patient-trajectory.py:101-113.
    * At scale this is a BroadcastNestedLoopJoin with a single-row build side
    * — constant cost per row, no shuffle.
    */
  def orderDayBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val minDate = t.orders.agg(min(col("o_orderdate")).as("min_date"))
    t.orders
      .crossJoin(broadcast(minDate))
      .select(
        floor(datediff(col("o_orderdate"), col("min_date")) / lit(30))
          .as("bucket")
      )
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Full-outer join (extension). */
  def customersPerNationFull(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.nation
      .join(t.customer, col("n_nationkey") === col("c_nationkey"), "full_outer")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** Correlated-subquery surface (C4 extension): EXISTS, NOT EXISTS and a
    * correlated scalar count in one statement. Catalyst decorrelates
    * these into left-semi / left-anti / aggregate-join plans — the same
    * physical shapes as the explicit joins above, which is exactly why
    * the SQL face is safe at scale.
    */
  def existsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.nation.createOrReplaceTempView("graft_nation_ex")
    t.supplier.createOrReplaceTempView("graft_supplier_ex")
    spark.sql(
      """SELECT n_name,
        | (SELECT count(*) FROM graft_supplier_ex s
        |  WHERE s.s_nationkey = n.n_nationkey) AS n_sup
        |FROM graft_nation_ex n
        |WHERE EXISTS (SELECT 1 FROM graft_supplier_ex s
        |              WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000)
        |  AND NOT EXISTS (SELECT 1 FROM graft_supplier_ex s
        |                  WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal < 1000)
        |ORDER BY n_name""".stripMargin)
  }

  def queries: Map[String, Q] = Map(
    "q_exists_subquery" -> (existsSubquery _),
    "q_join_star_revenue" -> (revenueBySegment _),
    "q_join_supplier_region" -> (supplierByRegion _),
    "q_join_left_outer" -> (ordersPerCustomer _),
    "q_join_left_anti" -> (customersWithoutOrders _),
    "q_join_left_semi" -> (activeCustomersBySegment _),
    "q_join_cross_scalar" -> (orderDayBuckets _),
    "q_join_full_outer" -> (customersPerNationFull _)
  )

  def oracles: Map[String, String] = Map(
    "q_exists_subquery" ->
      """SELECT n_name,
        | (SELECT count(*) FROM supplier s
        |  WHERE s.s_nationkey = n.n_nationkey) AS n_sup
        |FROM nation n
        |WHERE EXISTS (SELECT 1 FROM supplier s
        |              WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000)
        |  AND NOT EXISTS (SELECT 1 FROM supplier s
        |                  WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal < 1000)
        |ORDER BY n_name""".stripMargin,
    "q_join_star_revenue" ->
      """SELECT c_mktsegment,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_supplier_region" ->
      """SELECT r_name, n_name, count(*) AS n_suppliers,
        | round(sum(s_acctbal), 2) AS total_bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_left_semi" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_cross_scalar" ->
      """SELECT CAST(floor(datediff('day', m.min_date, o.o_orderdate) / 30.0) AS BIGINT) AS bucket,
        | count(*) AS n
        |FROM orders o CROSS JOIN (SELECT min(o_orderdate) AS min_date FROM orders) m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_full_outer" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        |FROM nation FULL OUTER JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
