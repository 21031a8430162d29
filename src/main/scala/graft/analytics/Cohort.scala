package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The reference's RWE dashboard + cohort analytics (01-rwe-dashboard.r,
  * 02-patient-trajectory.py:49-87) as a typed facade, generalized over any
  * (entity, category) table.
  */
object Cohort {

  /** Top-k categories by row count (01-rwe-dashboard.r:31-35), with the
    * tiebreaker sort the oracle harness requires.
    */
  def topCategories(df: DataFrame, categoryCol: String, k: Int): DataFrame =
    df.where(col(categoryCol).isNotNull)
      .groupBy(col(categoryCol))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(categoryCol).asc)
      .limit(k)

  /** Top-k categories by DISTINCT entity (01-rwe-dashboard.r:40-52). */
  def topCategoriesByEntity(
      df: DataFrame, entityCol: String, categoryCol: String, k: Int): DataFrame =
    df.where(col(categoryCol).isNotNull)
      .select(col(entityCol), col(categoryCol))
      .distinct()
      .groupBy(col(categoryCol))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col(categoryCol).asc)
      .limit(k)

  /** Entities matching a category pattern, case-insensitive contains
    * (02-patient-trajectory.py:53-56).
    */
  def entitiesWith(df: DataFrame, entityCol: String, categoryCol: String,
      pattern: String): DataFrame =
    df.where(lower(col(categoryCol)).contains(pattern.toLowerCase))
      .select(col(entityCol))
      .distinct()

  /** Top-k co-occurring categories among entities having `pattern`,
    * excluding the index category itself (01-rwe-dashboard.r:73-90:
    * comorbid conditions via join + NOT LIKE + dropDuplicates + count).
    */
  def coOccurring(df: DataFrame, entityCol: String, categoryCol: String,
      pattern: String, k: Int): DataFrame = {
    // left_semi against the raw filtered rows: the semi join dedupes the
    // cohort implicitly, saving the distinct's Exchange + aggregate pair
    // that an inner join against entitiesWith() would need
    val cohort = df
      .where(lower(col(categoryCol)).contains(pattern.toLowerCase))
      .select(col(entityCol))
    df.join(cohort, Seq(entityCol), "left_semi")
      .where(col(categoryCol).isNotNull &&
        !lower(col(categoryCol)).contains(pattern.toLowerCase))
      .select(col(entityCol), col(categoryCol))
      .distinct()
      .groupBy(col(categoryCol))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col(categoryCol).asc)
      .limit(k)
  }

  /** Case/control cohort: entities with the pattern labeled 1, an equal
    * number without it labeled 0 (02-patient-trajectory.py:68-82 —
    * including the reference's deliberate `limit(caseCount)` on controls,
    * made deterministic with an orderBy).
    *
    * The control cap is fully distributed, two-level: a local
    * `row_number` ranks candidates WITHIN each shuffle partition (many
    * independent window groups — no single-partition global sort), a
    * tiny per-partition count table yields running offsets, and rows
    * keep iff `offset + local_rank <= caseCount`, with the case count
    * riding as a 1-row broadcast aggregate. The old
    * `orderBy().limit(count.toInt)` planned as TakeOrderedAndProject —
    * every kept control materialized on the driver (OOM at millions)
    * and `.toInt` silently truncating past 2^31 — and the obvious
    * single `row_number().over(orderBy(...))` fix just moves the
    * bottleneck to one executor. Selection order is (partition id,
    * entity): deterministic for a fixed shuffle-partition count, which
    * is the same determinism-of-arbitrary-subset the reference's bare
    * `limit(caseCount)` was given via orderBy.
    */
  def caseControl(df: DataFrame, entityCol: String, categoryCol: String,
      pattern: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cases = entitiesWith(df, entityCol, categoryCol, pattern)
      .withColumn("label", lit(1))
    val caseCount = cases.agg(count(lit(1)).as("__case_count"))
    // materialized ONCE: ranked and offsets both consume the pid-stamped
    // rows, and separate re-evaluations could be re-planned differently
    // (AQE coalescing), de-syncing spark_partition_id between branches
    val candidates = df.select(col(entityCol)).distinct()
      .join(cases.select(entityCol), Seq(entityCol), "left_anti")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val ranked = candidates.withColumn("__lr",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(col(entityCol))))
    // per-partition counts: one row per shuffle partition — the global
    // running-sum window below is over that tiny table, not the data
    val offsets = candidates.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val controls = ranked
      .join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(caseCount))
      .where(col("__off") + col("__lr") <= col("__case_count"))
      .select(col(entityCol))
      .withColumn("label", lit(0))
    cases.union(controls)
  }

  /** Pearson chi-square over an (a, b) contingency table, fully
    * distributed (01-rwe-dashboard.r:109-124 collects the table into R's
    * chisq.test; here expected counts and the statistic are DataFrame
    * arithmetic — no driver-side table).
    *
    * The table is the FULL cross product of observed a-levels × b-levels:
    * a combination that never co-occurs still has expected count
    * rn*cn/t > 0 and contributes (0-e)²/e, exactly as R's chisq.test
    * builds it — deriving cells only from observed (a,b) pairs would
    * understate the statistic whenever a cell is empty.
    *
    * Returns one row: (chi2, dof, p_value) — the p-value via the
    * regularized-gamma survival function (graft.functions.Stats), from
    * the ROUNDED statistic so the result is reproducible across engines.
    */
  def chiSquare(df: DataFrame, a: Column, b: Column): DataFrame = {
    // cells is O(levels²) tiny, but EVERY downstream branch (level
    // distincts, row/col/grand totals, the cross join) re-derives it —
    // without a cut that re-runs the full input scan+agg ~6 times
    // (column pruning defeats ReuseExchange across the branches, same
    // effect as in TfIdf.bm25). Checkpoint the handful of rows once.
    val cells = df.groupBy(a.as("a"), b.as("b")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // observed level sets are tiny (categorical) — broadcast cross product
    val full = cells.select(col("a")).distinct()
      .crossJoin(broadcast(cells.select(col("b")).distinct()))
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n"))
    val rowTot = full.groupBy(col("a")).agg(sum(col("n")).as("rn"))
    val colTot = full.groupBy(col("b")).agg(sum(col("n")).as("cn"))
    val total = full.agg(sum(col("n")).as("t"))
    full
      .join(broadcast(rowTot), Seq("a"))
      .join(broadcast(colTot), Seq("b"))
      .crossJoin(broadcast(total))
      .withColumn("e", col("rn") * col("cn") / col("t"))
      .agg(
        round(sum(pow(col("n") - col("e"), 2) / col("e")), 4).as("chi2"),
        ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1)).as("dof"))
      .select(
        col("chi2"), col("dof"),
        round(graft.functions.Stats.chiSqPValue(col("chi2"), col("dof")), 6)
          .as("p_value"))
  }

  // ---------- declared queries over testdata ----------

  type Q = (SparkSession, String) => DataFrame

  /** Dashboard top-k re-expressed on orders: top order priorities. */
  def qTopCategories(spark: SparkSession, sfDir: String): DataFrame =
    topCategories(Tables(spark, sfDir).orders, "o_orderpriority", 3)

  /** Distinct-entity top-k: priorities by distinct customer. */
  def qTopByEntity(spark: SparkSession, sfDir: String): DataFrame =
    topCategoriesByEntity(Tables(spark, sfDir).orders, "o_custkey", "o_orderpriority", 3)

  /** Comorbidity-shaped co-occurrence: among customers with an URGENT
    * order, which other priorities co-occur (by distinct customer).
    */
  def qCoOccurring(spark: SparkSession, sfDir: String): DataFrame =
    coOccurring(Tables(spark, sfDir).orders, "o_custkey", "o_orderpriority", "urgent", 5)

  /** E8: chi-square of (mktsegment × high-balance flag), distributed. */
  def qChiSquare(spark: SparkSession, sfDir: String): DataFrame =
    chiSquare(Tables(spark, sfDir).customer,
      col("c_mktsegment"), (col("c_acctbal") > 5000).as("high"))

  def queries: Map[String, Q] = Map(
    "q_top_categories" -> (qTopCategories _),
    "q_top_by_entity" -> (qTopByEntity _),
    "q_cooccurring" -> (qCoOccurring _),
    "q_chi_square" -> (qChiSquare _)
  )

  def oracles: Map[String, String] = Map(
    "q_top_categories" ->
      """SELECT o_orderpriority, count(*) AS count FROM orders
        |WHERE o_orderpriority IS NOT NULL
        |GROUP BY o_orderpriority ORDER BY count DESC, o_orderpriority
        |LIMIT 3""".stripMargin,
    "q_top_by_entity" ->
      """SELECT o_orderpriority, count(*) AS n_entities
        |FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders
        |      WHERE o_orderpriority IS NOT NULL)
        |GROUP BY o_orderpriority ORDER BY n_entities DESC, o_orderpriority
        |LIMIT 3""".stripMargin,
    "q_cooccurring" ->
      """WITH cohort AS (SELECT DISTINCT o_custkey FROM orders
        |                WHERE lower(o_orderpriority) LIKE '%urgent%')
        |SELECT o_orderpriority, count(*) AS n_entities
        |FROM (SELECT DISTINCT o.o_custkey, o.o_orderpriority
        |      FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
        |      WHERE o.o_orderpriority IS NOT NULL
        |        AND lower(o.o_orderpriority) NOT LIKE '%urgent%')
        |GROUP BY o_orderpriority ORDER BY n_entities DESC, o_orderpriority
        |LIMIT 5""".stripMargin,
    // p-value: dof here is even ((5 segments - 1) × (2 flags - 1) = 4), so
    // the survival function has the closed form
    // Q(x; 2m) = exp(-x/2) * sum_{j<m} (x/2)^j / j! — computed from the
    // same rounded chi2 the Spark side feeds its gamma implementation.
    "q_chi_square" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS a, (c_acctbal > 5000) AS b, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |fc AS (
        |  SELECT a, b, coalesce(n, 0) AS n
        |  FROM (SELECT DISTINCT a FROM cells)
        |  CROSS JOIN (SELECT DISTINCT b FROM cells)
        |  LEFT JOIN cells USING (a, b)),
        |rt AS (SELECT a, sum(n) rn FROM fc GROUP BY a),
        |ct AS (SELECT b, sum(n) cn FROM fc GROUP BY b),
        |t AS (SELECT sum(n) t FROM fc),
        |stat AS (
        |  SELECT round(sum(pow(fc.n - (rn * cn * 1.0 / t.t), 2)
        |                   / (rn * cn * 1.0 / t.t)), 4) AS chi2,
        |    CAST((count(DISTINCT fc.a) - 1) * (count(DISTINCT fc.b) - 1) AS BIGINT) AS dof
        |  FROM fc JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN t)
        |SELECT chi2, dof,
        |  round(exp(-chi2 / 2) * list_sum([pow(chi2 / 2, j) / factorial(CAST(j AS INT))
        |                                   for j in range(0, CAST(dof / 2 AS INT))]), 6) AS p_value
        |FROM stat""".stripMargin
  )
}
