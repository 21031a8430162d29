package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Window-function coverage (SURVEY §2 H-rows + ranking/lag extensions).
  *
  * WindowExec = one shuffle on the partition keys + per-partition sort, then
  * a streaming frame walk. Partitioning by the entity key (customer) is the
  * scale-correct choice: frames never cross partitions, state is bounded by
  * one entity's history.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  /** Trailing-90-day range-frame sum + count (H1 + H2). Reference: the
    * trailing-N-days comorbidity features, 02-patient-trajectory.py:152-168:
    * `Window.partitionBy(PATIENT).orderBy(day).rangeBetween(-days, -1)`.
    * Frame deliberately excludes the current day (reference semantics,
    * SURVEY §7.5.3).
    */
  def trailingSpend(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val withDay = t.orders.withColumn(
      "day",
      datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
    )
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-90, -1)
    withDay
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        round(coalesce(sum(col("o_totalprice")).over(w), lit(0.0)), 2)
          .as("trailing_spend"),
        count(lit(1)).over(w).as("trailing_orders")
      )
      .orderBy(col("o_orderkey"))
  }

  /** Top-k per group via row_number (ranking extension; TPC-style). */
  def top3OrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t.orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_totalprice"),
        row_number().over(w).cast("bigint").as("rn")
      )
      .where(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** lag: days since previous order per customer (extension). */
  def orderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t.orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        coalesce(
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)),
          lit(-1)
        ).cast("bigint").as("gap_days")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Ranking-family breadth in one window pass: dense_rank, percent_rank,
    * cume_dist, ntile — all share a single `PARTITION BY status ORDER BY
    * (price, key)` sort, so Catalyst plans ONE Exchange + ONE sort for all
    * four. The orderkey tiebreak makes ntile deterministic (ntile depends
    * on row order, not just rank).
    */
  def rankFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables(spark, sfDir).orders
      .select(
        col("o_orderstatus"),
        col("o_orderkey"),
        dense_rank().over(w).cast("bigint").as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).cast("bigint").as("quartile")
      )
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** Value-function family: first/last/nth over an explicit whole-partition
    * frame (the default ORDER BY frame stops at the current row, which
    * makes last_value a footgun — pin the frame, share one sort). Values
    * pass through untouched (no arithmetic), so no rounding is needed for
    * engine parity.
    */
  def valueFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, sfDir).orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Time-typed RANGE frame: a trailing-30-day spend window ordered by
    * the raw TIMESTAMP with an INTERVAL bound — no day-index
    * pre-projection needed (the calendar arithmetic happens inside the
    * frame evaluation). RANGE includes order-date peers in the frame, so
    * the result is deterministic under ties without a tiebreaker column.
    * Expressed through the SQL surface: the DataFrame `rangeBetween`
    * API takes only long offsets, while SQL accepts interval literals —
    * the engine supports both frame dialects on one Window machinery.
    */
  def intervalRange(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir).orders.createOrReplaceTempView("graft_win_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW), 2)
        |   AS spend_30d,
        | count(*) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW)
        |   AS orders_30d
        |FROM graft_win_orders ORDER BY o_orderkey""".stripMargin)
  }

  /** Running COUNT(DISTINCT) over a window — a shape Spark's WindowExec
    * rejects outright (`DISTINCT is not supported in window functions`).
    * The classic rewrite: flag each row that is the FIRST occurrence of its
    * (customer, priority) pair in event order (row_number = 1 over the
    * pair), then a running sum of flags per customer gives the number of
    * distinct priorities seen so far. The two window specs partition on
    * DIFFERENT key sets — (custkey, priority) then (custkey) — which
    * EnsureRequirements would naively plan as two hash exchanges, because
    * hash(custkey, priority) does NOT satisfy clustering on custkey
    * alone. The explicit repartition on the shared PREFIX key flips
    * that: hash(custkey) co-locates every (custkey, priority) group too
    * (subset-satisfies), so BOTH windows run off one exchange with only
    * a per-partition re-sort between them (plan-asserted in PlanSpec).
    * The orderkey tiebreak plus an explicit ROWS frame makes every
    * prefix deterministic.
    */
  def runningDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val wFirst = Window
      .partitionBy(col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wRun = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir).orders
      .repartition(col("o_custkey"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L).as("first_seen"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("first_seen")).over(wRun).as("n_priorities_seen"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def queries: Map[String, Q] = Map(
    "q_window_running_distinct" -> (runningDistinct _),
    "q_window_range_interval" -> (intervalRange _),
    "q_window_trailing" -> (trailingSpend _),
    "q_window_topk_group" -> (top3OrdersPerCustomer _),
    "q_window_lag_gap" -> (orderGaps _),
    "q_window_rank_funcs" -> (rankFunctions _),
    "q_window_value_funcs" -> (valueFunctions _)
  )

  def oracles: Map[String, String] = Map(
    "q_window_running_distinct" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(first_seen) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS n_priorities_seen
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN row_number() OVER (
        |        PARTITION BY o_custkey, o_orderpriority
        |        ORDER BY o_orderdate, o_orderkey) = 1
        |      THEN 1 ELSE 0 END AS first_seen
        |  FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range_interval" ->
      """SELECT o_orderkey, o_custkey,
        | round(sum(o_totalprice) OVER w, 2) AS spend_30d,
        | count(*) OVER w AS orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_trailing" ->
      """SELECT o_orderkey, o_custkey,
        | round(ifnull(sum(o_totalprice) OVER w, 0), 2) AS trailing_spend,
        | count(*) OVER w AS trailing_orders
        |FROM (SELECT *, datediff('day', DATE '1995-01-01', o_orderdate) AS day FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag_gap" ->
      """SELECT o_custkey, o_orderkey,
        | ifnull(datediff('day',
        |   lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey),
        |   o_orderdate), -1) AS gap_days
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_rank_funcs" ->
      """SELECT o_orderstatus, o_orderkey,
        | dense_rank() OVER w AS drank,
        | round(percent_rank() OVER w, 6) AS prank,
        | round(cume_dist() OVER w, 6) AS cdist,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_window_value_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER w AS last_price,
        | nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
