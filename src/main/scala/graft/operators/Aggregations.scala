package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Aggregation / distinct / dedup coverage (SURVEY §2 E-rows + extensions).
  *
  * All groupBys are partial-aggregated map-side by Catalyst (HashAggregate
  * pair), so the shuffle carries only group keys × partial states — the
  * pattern that survives 100 TB. Distinct over a high-cardinality key is the
  * one genuinely shuffle-heavy op here; approx_count_distinct is provided as
  * the scale-path alternative.
  */
object Aggregations {

  type Q = (SparkSession, String) => DataFrame

  /** Multi-key groupBy (E4-shape: 4 keys). Reference: prediction breakdown by
    * 5 demographic cols, 03-work with ML models.py:119-121.
    */
  def multiKeyBreakdown(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(
        col("c_mktsegment"),
        col("c_nationkey"),
        col("o_orderstatus"),
        col("o_orderpriority")
      )
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(
        col("c_mktsegment"),
        col("c_nationkey"),
        col("o_orderstatus"),
        col("o_orderpriority")
      )
  }

  /** Global extrema aggregate, no grouping (E5). Reference: max AUC over
    * runs, 03-work with ML models.py:191.
    */
  def priceExtrema(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .agg(
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        count(lit(1)).as("n")
      )

  /** SELECT DISTINCT (E6). Reference: distinct patients per condition,
    * 01-rwe-dashboard.r:46.
    */
  def distinctCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select(col("o_custkey"))
      .distinct()
      .orderBy(col("o_custkey"))

  /** dropDuplicates on a subset (E7). Reference: one row per (PATIENT,
    * REASONDESCRIPTION), 02-patient-trajectory.py:60. The survivor row is
    * non-deterministic, so the declared query projects only the dedup keys
    * (deterministic set) and aggregates.
    */
  def dedupCustomerStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .dropDuplicates("o_custkey", "o_orderstatus")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** count-distinct vs approx_count_distinct (extension; the scale path for
    * distinct over high-cardinality keys). Oracle checks the exact count
    * only; the approx value is engine-tested for ±5% in ScalaTest.
    */
  def distinctPartsPerStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** Grouping-sets rollup (extension surface; built-in `rollup`). */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .na.fill("ALL", Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** CUBE over two dimensions (extension surface; built-in `cube`) —
    * all four grouping sets in one pass; Spark expands grouping sets
    * map-side, so this is still a single shuffle.
    */
  def cubeRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .na.fill("ALL", Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Explicit GROUPING SETS (extension): two unrelated dimension rollups in
    * one aggregation pass, the grouping-sets shape CUBE/ROLLUP can't
    * express. Via spark.sql — the DataFrame API has no grouping-sets
    * builder (SPARK-34932 added it to SQL only).
    */
  def groupingSetsRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.lineitem.createOrReplaceTempView("graft_lineitem_gs")
    spark.sql(
      """SELECT ifnull(l_returnflag, 'ALL') AS l_returnflag,
        | ifnull(cast(l_linenumber AS string), 'ALL') AS l_linenumber,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linenumber))
        |ORDER BY 1, 2""".stripMargin)
  }

  /** Pivot (extension): status columns per segment via the DataFrame
    * `pivot` operator with an explicit value list. Explicit values matter
    * at scale — omitting them triggers a driver-side distinct collect to
    * discover the columns.
    */
  def pivotStatusBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("c_mktsegment"))
  }

  /** Exact percentiles (extension): `percentile` (exact interpolated) maps
    * to DuckDB `quantile_cont`. The approximate scale path
    * (`approx_percentile` / t-digest) is engine-tested only — approx
    * algorithms differ across engines by design.
    */
  def pricePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99")
      )
      .orderBy(col("o_orderstatus"))

  /** Approximate quantiles at scale: `approx_percentile` keeps a
    * mergeable bounded sketch per group (partial-aggregated map-side like
    * any builtin — the 100 TB path when exact `percentile`'s
    * collect-all-values-per-group buffer won't fit). Approx algorithms
    * differ across engines by design, so the ORACLE contract is the HLL
    * row's: ship the exact values plus a boolean asserting the sketch
    * estimate landed within the advertised error (rank error 1/accuracy,
    * checked here as <=1% relative on the value scale).
    */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_exact"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("__a50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("__a90"))
      .select(
        col("o_orderstatus"), col("p50_exact"), col("p90_exact"),
        (abs(col("__a50") - col("p50_exact")) / col("p50_exact") <= 0.01 &&
          abs(col("__a90") - col("p90_exact")) / col("p90_exact") <= 0.01)
          .as("within_1pct"))
      .orderBy(col("o_orderstatus"))

  def queries: Map[String, Q] = Map(
    "q_approx_quantile" -> (approxQuantiles _),
    "q_percentiles" -> (pricePercentiles _),
    "q_group_multikey" -> (multiKeyBreakdown _),
    "q_agg_extrema" -> (priceExtrema _),
    "q_distinct_customers" -> (distinctCustomers _),
    "q_dropdup_subset" -> (dedupCustomerStatus _),
    "q_count_distinct" -> (distinctPartsPerStatus _),
    "q_rollup" -> (rollupRevenue _),
    "q_cube" -> (cubeRevenue _),
    "q_grouping_sets" -> (groupingSetsRevenue _),
    "q_pivot" -> (pivotStatusBySegment _)
  )

  def oracles: Map[String, String] = Map(
    "q_approx_quantile" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
        | true AS within_1pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_group_multikey" ->
      """SELECT c_mktsegment, c_nationkey, o_orderstatus, o_orderpriority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_agg_extrema" ->
      """SELECT round(max(o_totalprice), 2) AS max_price,
        | round(min(o_totalprice), 2) AS min_price,
        | round(avg(o_totalprice), 4) AS avg_price,
        | count(*) AS n
        |FROM orders""".stripMargin,
    "q_distinct_customers" ->
      "SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey",
    "q_dropdup_subset" ->
      """SELECT o_orderstatus, count(*) AS n
        |FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT ifnull(l_returnflag, 'ALL') AS l_returnflag,
        | ifnull(l_linestatus, 'ALL') AS l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT ifnull(l_returnflag, 'ALL') AS l_returnflag,
        | ifnull(l_linestatus, 'ALL') AS l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_grouping_sets" ->
      """SELECT ifnull(l_returnflag, 'ALL') AS l_returnflag,
        | ifnull(cast(l_linenumber AS varchar), 'ALL') AS l_linenumber,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linenumber))
        |ORDER BY 1, 2""".stripMargin,
    "q_pivot" ->
      """SELECT c_mktsegment,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
