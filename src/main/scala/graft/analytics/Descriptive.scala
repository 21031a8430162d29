package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Descriptive / inferential statistics beyond plain aggregates (extends
  * SURVEY §2 E-rows; reference's dashboard computes correlations and
  * per-cohort distribution summaries, 01-rwe-dashboard.r:62-124).
  *
  * Everything here is a single hash-aggregate pass: Spark's built-in
  * moment aggregates (corr / covar / stddev / regr_*) are all
  * DeclarativeAggregates with map-side partial merge, so the shuffle
  * carries O(groups) fixed-width state regardless of input size — the
  * shape that survives 100 TB.
  */
object Descriptive {

  type Q = (SparkSession, String) => DataFrame

  /** Bivariate moments per group: Pearson correlation, sample/population
    * covariance, sample stddev, and the least-squares fit (slope +
    * intercept) of extendedprice on quantity. All are one-pass
    * DeclarativeAggregates — no window, no second scan.
    */
  def statsMoments(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_s"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_p"),
        round(stddev_samp(col("l_extendedprice")), 4).as("stddev_price"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept")
      )
      .orderBy(col("l_returnflag"))

  /** Fixed-width histogram of order totals: bin = floor(price / width).
    * Binning by arithmetic keeps the aggregate a single shuffle on the
    * bin id; no driver-side bucketing, no sort. min/max per bin double as
    * a bounds check on the binning itself.
    */
  def histogram(spark: SparkSession, sfDir: String, width: Double = 25000.0): DataFrame =
    Tables(spark, sfDir).orders
      .select(floor(col("o_totalprice") / lit(width)).as("bin"), col("o_totalprice"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi")
      )
      .orderBy(col("bin"))

  /** Ordered conversion funnel over the event stream: view -> click ->
    * purchase, where each stage must happen strictly AFTER the user's
    * previous stage time (not just co-occur).
    *
    * Plan shape: ONE shuffle. All three stage times are windows over the
    * same `PARTITION BY user_id`, so Catalyst plans a single Exchange and
    * chains three Window operators over it; the per-user reduce then
    * reuses that same hash partitioning (no further Exchange). The naive
    * formulation — three filtered aggregates joined on user_id — costs
    * three shuffles; the DuckDB oracle uses that join form to stay
    * engine-independent while this plan stays single-pass.
    *
    * Timestamps stay in raw epoch-nano bigints end-to-end (comparisons
    * only — no conversion needed, and integer compare is codegen-friendly).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn(
        "tc",
        min(when(col("event_type") === "click" && col("ts") > col("tv"), col("ts"))).over(w))
      .withColumn(
        "tp",
        min(when(col("event_type") === "purchase" && col("ts") > col("tc"), col("ts"))).over(w))
    staged
      .groupBy(col("user_id"))
      .agg(min(col("tv")).as("tv"), min(col("tc")).as("tc"), min(col("tp")).as("tp"))
      .agg(
        count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click"),
        count(col("tp")).as("n_purchase")
      )
  }

  /** Fuzzy string match: distinct part-name pairs within Levenshtein
    * distance 3 ("cold rod" ~ "blue rod" conflation). The built-in
    * `levenshtein` is codegen'd; the distinct shrinks the self-join input
    * to the vocabulary (64 names here), which Spark then broadcasts —
    * fuzzy conflation is a dim-vocabulary operation. For corpus-scale
    * string dedup the blocking path (shingle / SimHash buckets from
    * [[graft.text.Dedup]]) replaces the all-pairs join.
    */
  def fuzzyPartNames(spark: SparkSession, sfDir: String, maxDist: Int = 3): DataFrame = {
    // materialize the tiny vocabulary once: the self-join replans the
    // scan+distinct per side otherwise (BroadcastExchange blocks
    // ReuseExchange)
    val names = Tables(spark, sfDir).part.select(col("p_name")).distinct()
      .localCheckpoint(true)
    names.select(col("p_name").as("a_name"))
      .join(broadcast(names.select(col("p_name").as("b_name"))),
        col("a_name") < col("b_name"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("bigint"))
      .where(col("dist") <= maxDist)
      .orderBy(col("a_name"), col("b_name"))
  }

  /** ANALYZE-style column profile: count / nulls / exact distinct /
    * min / max for a column set, unpivoted to a row per column — the
    * dataset-card shape a training pipeline records per snapshot.
    *
    * Two cheap single-scan passes instead of one multi-count-distinct
    * aggregate: the distinct-heavy plan Expands every row per counted
    * column AND drags all the other agg buffers through that multiplied
    * shuffle (measured 5.3 s at sf0.1); here pass 1 is a plain 1-row
    * aggregate (count/nulls/min/max) and pass 2 explodes only
    * (column, value) pairs whose map-side partial dedup collapses to the
    * per-column vocabulary before shuffling.
    */
  def profileColumns(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_discount", "l_linestatus", "l_returnflag")
    val li = Tables(spark, sfDir).lineitem
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    // exact ndv per column: (column, value) pairs, two-phase distinct —
    // the string cast is injective on these columns' native values
    val ndv = li.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v"))
    }: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.v").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("column"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    wide.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }: _*)).as("p"))
      .select(col("p.*"))
      .join(broadcast(ndv), Seq("column"))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_val"), col("max_val"))
      .orderBy(col("column"))
  }

  /** Linear interpolation over a gappy daily series: days where
    * dayofmonth % 3 == 0 are deterministically "missing"; each gap is
    * filled by the straight line between its known neighbors (edges
    * carry the nearest known value). The carry-forward/backward pairs
    * are IGNORE NULLS window functions over the dense calendar.
    *
    * Scale note: the window is over a CALENDAR (one row per day), which
    * is list-scale no matter how big the fact table is — the heavy
    * aggregation into `daily` happened on the grouped shuffle before the
    * window ever runs.
    */
  def interpolateDaily(spark: SparkSession, sfDir: String): DataFrame = {
    // NOT spread: the per-day decimal partial aggregation is cheap per
    // row and the 3-pass bench showed the exchange as a loss
    // (0.89 -> 1.15 s with the spread)
    val daily = Tables(spark, sfDir).orders
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .groupBy(col("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    val known = daily.where(dayofmonth(col("day")) % 3 =!= 0)
    val calendar = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val joined = calendar.join(known, Seq("day"), "left")
    val wb = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownDay = when(col("revenue").isNotNull, col("day"))
    val out = joined
      .withColumn("pv", last(col("revenue"), ignoreNulls = true).over(wb))
      .withColumn("pd", last(knownDay, ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("revenue"), ignoreNulls = true).over(wf))
      .withColumn("nd", first(knownDay, ignoreNulls = true).over(wf))
    out.select(
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("revenue").isNotNull.as("known"),
      // floor-to-4-decimals, NOT round: the gap midpoints of 2-decimal
      // inputs tie at exactly .5 of the 4th decimal, where Spark
      // (HALF_UP) and DuckDB disagree; the doubles themselves are
      // bit-identical across engines (decimal-exact inputs + identical
      // association), so floor is engine-stable where round is not
      (floor(
        when(col("revenue").isNotNull, col("revenue"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")).cast("double") /
            datediff(col("nd"), col("pd")).cast("double")) * 10000) / 10000)
        .as("revenue_interp"))
      .orderBy(col("day"))
  }

  /** Trend detection over an aggregated time series: roll orders up to
    * (priority, month) revenue, then fit revenue-vs-month per priority
    * with the regr_* family — slope, intercept, and r² in the same
    * one-pass aggregate. The month axis is plain integer arithmetic,
    * CENTERED near the data (months since 1995-01) — an uncentered
    * epoch-month axis extrapolates the intercept to year 0, amplifying
    * the engines' last-ulp regression differences ~24000× past any
    * rounding tolerance. Monthly revenue is summed through DECIMAL so
    * both engines feed the regression bit-identical y values; the
    * regression itself then reduces ~80 months per group to three
    * doubles. Two shuffles, both on tiny key spaces.
    */
  def trendRegression(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables(spark, sfDir).orders
      .groupBy(
        col("o_orderpriority"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")))
          .cast("double").as("m"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
    monthly
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_months"),
        round(regr_slope(col("rev"), col("m")), 4).as("slope"),
        round(regr_intercept(col("rev"), col("m")), 2).as("intercept"),
        round(regr_r2(col("rev"), col("m")), 6).as("r2"))
      .orderBy(col("o_orderpriority"))
  }

  def queries: Map[String, Q] = Map(
    "q_regr_trend" -> (trendRegression _),
    "q_stats_moments" -> (statsMoments _),
    "q_histogram" -> ((s: SparkSession, d: String) => histogram(s, d)),
    "q_funnel" -> (funnel _),
    "q_fuzzy_levenshtein" -> ((s: SparkSession, d: String) => fuzzyPartNames(s, d)),
    "q_profile_columns" -> (profileColumns _),
    "q_interpolate_daily" -> (interpolateDaily _)
  )

  def oracles: Map[String, String] = Map(
    "q_regr_trend" ->
      """WITH monthly AS (
        |  SELECT o_orderpriority,
        |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) AS DOUBLE) AS m,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, count(*) AS n_months,
        | round(regr_slope(rev, m), 4) AS slope,
        | round(regr_intercept(rev, m), 2) AS intercept,
        | round(regr_r2(rev, m), 6) AS r2
        |FROM monthly GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_stats_moments" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
        | round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
        | round(stddev_samp(l_extendedprice), 4) AS stddev_price,
        | round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin, count(*) AS n,
        | round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "q_fuzzy_levenshtein" ->
      """WITH d AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS a_name, b.p_name AS b_name,
        | levenshtein(a.p_name, b.p_name) AS dist
        |FROM d a JOIN d b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY a_name, b_name""".stripMargin,
    "q_profile_columns" ->
      """SELECT 'l_quantity' AS "column", count(*) AS n,
        |  count(*) - count(l_quantity) AS n_null,
        |  count(DISTINCT l_quantity) AS n_distinct,
        |  min(l_quantity)::VARCHAR AS min_val, max(l_quantity)::VARCHAR AS max_val
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(*),
        |  count(*) - count(l_discount),
        |  count(DISTINCT l_discount),
        |  min(l_discount)::VARCHAR, max(l_discount)::VARCHAR
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', count(*),
        |  count(*) - count(l_linestatus),
        |  count(DISTINCT l_linestatus),
        |  min(l_linestatus), max(l_linestatus)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(*),
        |  count(*) - count(l_returnflag),
        |  count(DISTINCT l_returnflag),
        |  min(l_returnflag), max(l_returnflag)
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,
    "q_interpolate_daily" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue
        |  FROM orders GROUP BY 1),
        |known AS (SELECT * FROM daily WHERE date_part('day', day) % 3 <> 0),
        |cal AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT min(day) AS mn, max(day) AS mx FROM daily)),
        |j AS (SELECT c.day, k.revenue FROM cal c LEFT JOIN known k USING (day)),
        |w AS (SELECT day, revenue,
        |  last_value(revenue IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |  first_value(revenue IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  (revenue IS NOT NULL) AS known,
        |  floor((CASE WHEN revenue IS NOT NULL THEN revenue
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * date_diff('day', pd, day)::DOUBLE
        |              / date_diff('day', pd, nd)::DOUBLE
        |  END) * 10000) / 10000 AS revenue_interp
        |FROM w ORDER BY day""".stripMargin
  )
}
