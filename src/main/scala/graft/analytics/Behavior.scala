package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Time-series and cohort behavior analytics (extension surface; the
  * reference's dashboard trends conditions over months,
  * 01-rwe-dashboard.r:62-77 — these are the two follow-on shapes every
  * longitudinal dashboard needs: dense time axes and retention grids).
  */
object Behavior {

  type Q = (SparkSession, String) => DataFrame

  /** Gap-filled daily revenue: a dense calendar from the data's own
    * min/max date, left-joined to per-day aggregates, absent days as
    * zeros. The calendar comes from a 1-row bounds aggregate exploded
    * into one row per day — never a driver-side date loop — and the
    * per-day aggregate side is partially aggregated map-side before its
    * shuffle. The calendar side is tiny (days, not rows), so AQE
    * broadcasts it into the join.
    */
  def gapFilledDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir).orders
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
    val daily = orders
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    val calendar = orders
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    calendar
      .join(daily, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue")
      )
      .orderBy(col("day"))
  }

  /** Classic retention grid: customers bucketed by first-order month
    * (cohort), counted distinct in each later month offset. Two shuffles
    * total — the first-month aggregate shuffles on custkey and the
    * activity join reuses that partitioning; only the final (cohort,
    * offset) rollup re-shuffles, on a tiny key space. Month offset is
    * plain year/month arithmetic (engine-agnostic, no interval
    * semantics).
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val acts = Tables(spark, sfDir).orders
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
    val firsts = acts.groupBy(col("o_custkey")).agg(min(col("m")).as("m0"))
    acts
      .join(firsts, "o_custkey")
      .select(
        date_format(col("m0"), "yyyy-MM").as("cohort"),
        ((year(col("m")) - year(col("m0"))) * 12 +
          (month(col("m")) - month(col("m0")))).cast("bigint").as("offset_m"),
        col("o_custkey")
      )
      .groupBy(col("cohort"), col("offset_m"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
      .orderBy(col("cohort"), col("offset_m"))
  }

  /** Rolling z-score anomaly detection over the event stream (the
    * monitoring shape: flag a user's event whose value departs >3σ from
    * THEIR own trailing window). One shuffle keyed by user, one sort per
    * partition, three frame aggregates sharing the same window spec (one
    * WindowExec) — scales as a single pass however long the history. The
    * frame EXCLUDES the current row (an anomaly must not dilute its own
    * baseline) and warms up for 10 events so early noise doesn't flag.
    */
  def anomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val scored = ev
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .where(col("n_win") >= 10 && col("sd") > 1e-9)
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
    scored.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_scored"),
        sum((abs(col("z")) > 3).cast("long")).as("n_anomalies"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** Recency-weighted engagement: each event's value decays with a 30-day
    * half-life measured from the newest event in the table (a deterministic
    * reference point — never wall-clock, which would break reproducibility).
    * Age is whole UTC days via exact integer division on the canonical
    * nano-epoch (`div`, not `/` — double division of ~1.7e18 nanos loses
    * the day boundary to the 53-bit mantissa). The reference point is a
    * 1-row aggregate broadcast into the scan, so the plan is one map pass
    * plus the final per-user aggregate — no corpus shuffle beyond it.
    */
  def decayedEngagement(spark: SparkSession, sfDir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val ev = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), expr(s"ts div $dayNs").as("d"), col("value"))
    val ref = ev.agg(max(col("d")).as("d_max"))
    ev.crossJoin(broadcast(ref))
      .groupBy(col("user_id"))
      .agg(
        round(sum(col("value") *
          pow(lit(0.5), (col("d_max") - col("d")).cast("double") / 30.0)), 4)
          .as("decayed_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over the event stream: per-user
    * event bigrams via lag (one shuffle keyed by user, one sort), then a
    * global (prev, next) rollup with the row-conditional probability from
    * a tiny window over the k×k transition counts. The heavy work is the
    * single per-user WindowExec; the probability normalization runs on at
    * most |event_types|² rows.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_next",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("prev_type"))), 6))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Exponentially-weighted moving average over each event type's DAILY
    * value series (the classic trend smoother; unlike the window
    * functions it is genuinely recursive — EWMA_t = α·x_t + (1-α)·EWMA_{t-1}
    * — so no frame spec expresses it). The recursion runs as an
    * `aggregate` fold over the per-key day-ordered series: series are
    * bounded (days, not events), keys fold in parallel, and the corpus
    * itself only shuffles for the daily pre-aggregate. The closed-form
    * alternative Σ x_i·(1-α)^(t-i) via pow over a window was rejected:
    * (1-α)^(-i) overflows doubles past ~6k rows, the fold never does.
    *
    * Float exactness: daily sums pass through DECIMAL(18,2); α = 0.25
    * and 1-α = 0.75 are exact binary fractions; both engines fold the
    * identical value sequence left-to-right with the first day as the
    * seed (DuckDB `list_reduce` convention) — so the fold is bit-exact
    * before the final round.
    */
  def ewmaDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = Tables(spark, sfDir).eventsRaw
      .select(col("event_type"), expr(s"ts div $dayNs").as("d"), col("value"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("d"), col("v")))).as("series"))
      .select(
        col("event_type"),
        size(col("series")).cast("bigint").as("n_days"),
        round(expr(
          "aggregate(slice(series, 2, size(series) - 1), element_at(series, 1).v, " +
            "(acc, s) -> 0.25d * s.v + 0.75d * acc)"), 6).as("ewma"))
      .orderBy(col("event_type"))
  }

  /** Holt's linear-trend smoothing over the same per-type daily series
    * as [[ewmaDaily]] — the DOUBLE recursion (level + trend) that makes
    * plain EWMA lag a trending series:
    * l_t = α·x_t + (1-α)(l_{t-1} + b_{t-1}),
    * b_t = γ(l_t - l_{t-1}) + (1-γ)·b_{t-1}, seeded l_1 = x_1, b_1 = 0.
    * The accumulator is a STRUCT folded through `aggregate` (Spark) /
    * `list_reduce` (the oracle) — both engines run the identical
    * constant set and fold order, so level/trend/forecast are bit-exact
    * before rounding. Emits the 3-day-ahead forecast l + 3b, the number
    * every capacity dashboard actually wants.
    */
  def holtTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = Tables(spark, sfDir).eventsRaw
      .select(col("event_type"), expr(s"ts div $dayNs").as("d"), col("value"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    daily
      .groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(d, v))), s -> s.v)").as("vs"))
      .withColumn("h", expr(
        "aggregate(slice(vs, 2, size(vs) - 1), " +
          "named_struct('l', element_at(vs, 1), 'b', cast(0.0 as double)), " +
          "(acc, x) -> named_struct(" +
          "'l', 0.5d * x + 0.5d * (acc.l + acc.b), " +
          "'b', 0.3d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l) + 0.7d * acc.b))"))
      .select(
        col("event_type"),
        size(col("vs")).cast("bigint").as("n_days"),
        round(col("h.l"), 6).as("level"),
        round(col("h.b"), 6).as("trend"),
        round(col("h.l") + lit(3.0) * col("h.b"), 6).as("forecast_3"))
      .orderBy(col("event_type"))
  }

  /** The pure-SQL spelling of [[ewmaDaily]] through the injected `ewma`
    * function ([[graft.functions.Smoothers]], registered by
    * [[graft.core.GraftExtensions]]): daily DECIMAL pre-aggregate, day-
    * ordered series assembly, and the smoothing fold all in one SQL
    * statement — the notebook-cell shape the reference's SQL-first users
    * write (01-rwe-dashboard.r:30-44). `ewma(...)` EXPANDS to the exact
    * aggregate() fold the DataFrame twin runs, so the two queries are
    * bit-identical before rounding and share one DuckDB oracle
    * arithmetic.
    */
  def ewmaSql(spark: SparkSession, sfDir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    Tables(spark, sfDir).eventsRaw.createOrReplaceTempView("graft_events_raw")
    spark.sql(
      s"""SELECT event_type, CAST(size(vs) AS BIGINT) AS n_days,
         |  round(ewma(vs, 0.25D), 6) AS ewma
         |FROM (
         |  SELECT event_type,
         |    transform(sort_array(collect_list(struct(d, v))), s -> s.v) AS vs
         |  FROM (
         |    SELECT event_type, ts div $dayNs AS d,
         |      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |    FROM graft_events_raw GROUP BY event_type, ts div $dayNs)
         |  GROUP BY event_type)
         |ORDER BY event_type""".stripMargin)
  }

  /** The pure-SQL spelling of [[holtTrend]] through the injected
    * `holt_smooth` function — level, trend, and the 3-day forecast from
    * one SQL statement. Same bit-exactness argument as [[ewmaSql]].
    */
  def holtSql(spark: SparkSession, sfDir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    Tables(spark, sfDir).eventsRaw.createOrReplaceTempView("graft_events_raw")
    spark.sql(
      s"""SELECT event_type, CAST(size(vs) AS BIGINT) AS n_days,
         |  round(h.level, 6) AS level, round(h.trend, 6) AS trend,
         |  round(h.level + 3.0D * h.trend, 6) AS forecast_3
         |FROM (
         |  SELECT event_type, vs, holt_smooth(vs, 0.5D, 0.3D) AS h
         |  FROM (
         |    SELECT event_type,
         |      transform(sort_array(collect_list(struct(d, v))), s -> s.v) AS vs
         |    FROM (
         |      SELECT event_type, ts div $dayNs AS d,
         |        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |      FROM graft_events_raw GROUP BY event_type, ts div $dayNs)
         |    GROUP BY event_type))
         |ORDER BY event_type""".stripMargin)
  }

  /** Top session PATHS — the path-mining rollup behind every "how do
    * users actually move through the product" dashboard: sessionize by
    * 30-minute inactivity gaps (gaps-and-islands over one per-user
    * window — no session_window state machinery needed in batch), take
    * each session's first 5 event types in time order, and count the
    * most common paths. Two per-user sorts share the SAME window
    * partitioning (user shuffle happens once); the path rollup is a
    * tiny-key aggregate.
    *
    * Path assembly uses sort_array(collect_list(struct(rn, type))) —
    * collect_list order is partition-nondeterministic, the struct sort
    * makes the joined path deterministic.
    */
  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 30L * 60L * 1000000000L
    val ev = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts") - col("prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
    val w2 = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    sess
      .withColumn("rn", row_number().over(w2))
      .where(col("rn") <= 5)
      .groupBy(col("user_id"), col("sid"))
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(rn, event_type))), s -> s.event_type)"),
        "->").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  /** Time-weighted average value per event type (TWAP — the correct
    * mean over IRREGULARLY-spaced observations, where the plain average
    * over-weights bursts): each observation holds its value until the
    * next one, so it weighs `next_ts - ts`; the last observation per
    * type carries no interval and drops, the standard left-Riemann
    * convention. Weights are exact integer nanos summed as longs; only
    * the final division is floating, so round(…, 6) is engine-stable.
    *
    * The per-row `lead` must NOT window on the bare event type: with a
    * handful of types the whole table would sort into that many
    * unsplittable window partitions — the hot-gram hazard this repo
    * documents elsewhere (AQE splits skewed joins, never windows), fatal
    * at 100× scale. Instead the fold is SEGMENTED: lead within
    * (event_type, hour-bucket) — partitions bounded by time, not by type
    * cardinality — and each bucket's last row stitches to the next
    * non-empty bucket's first observation through a bucket-level frame
    * that is ~|buckets|·|types| rows (broadcast-sized) no matter how big
    * the raw table is. Identical arithmetic to the global lead: a row's
    * successor is in its own bucket or is its type's next bucket's first.
    */
  def twapByType(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketNanos = 3600L * 1000000000L
    val e = Tables(spark, sfDir).eventsRaw
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("bucket", expr(s"ts div $bucketNanos"))
    // first observation per non-empty (type, bucket) under the window
    // order (ts, event_id): struct-min IS that lexicographic first
    val wBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val stitch = e.groupBy(col("event_type"), col("bucket"))
      .agg(min(struct(col("ts"), col("event_id"))).getField("ts").as("first_ts"))
      .withColumn("next_first_ts", lead(col("first_ts"), 1).over(wBucket))
      .select(col("event_type"), col("bucket"), col("next_first_ts"))
    val w = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("lead_ts", lead(col("ts"), 1).over(w))
      .join(broadcast(stitch), Seq("event_type", "bucket"))
      .withColumn("dt", coalesce(col("lead_ts"), col("next_first_ts")) - col("ts"))
      .where(col("dt").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_intervals"),
        round(sum(col("value") * col("dt")) / sum(col("dt")), 6).as("twap"),
        round(avg(col("value")), 6).as("plain_avg"))
      .orderBy(col("event_type"))
  }

  /** Conversion-WINDOW funnel — [[Descriptive.funnel]]'s ordered chain
    * with the latency constraint every real funnel carries: each step
    * counts only within `gap` (6 h) of the previous step, and the report
    * includes the mean step latencies. Per-step min-timestamps come from
    * step-filtered aggregates joined forward (each join's build side is
    * the converted-user set — strictly shrinking, AQE broadcasts it);
    * latency averages stay exact: nano diffs sum as longs far below
    * 2^53 before the single floating division.
    */
  def funnelWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    val gap = 6L * 3600L * 1000000000L
    val e = Tables(spark, sfDir).eventsRaw
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("tv") && col("ts") <= col("tv") + gap)
      .groupBy(col("user_id"), col("tv")).agg(min(col("ts")).as("tc"))
    val p = e.where(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("tc")), Seq("user_id"))
      .where(col("ts") > col("tc") && col("ts") <= col("tc") + gap)
      .groupBy(col("user_id"), col("tc")).agg(min(col("ts")).as("tp"))
    val nv = v.agg(count(lit(1)).as("n_view"))
    val nc = c.agg(
      count(lit(1)).as("n_click_in_window"),
      round(avg(col("tc") - col("tv")) / 1e9, 3).as("avg_view_to_click_s"))
    val np = p.agg(
      count(lit(1)).as("n_purchase_in_window"),
      round(avg(col("tp") - col("tc")) / 1e9, 3).as("avg_click_to_purchase_s"))
    nv.crossJoin(nc).crossJoin(np)
      .select(col("n_view"), col("n_click_in_window"), col("n_purchase_in_window"),
        col("avg_view_to_click_s"), col("avg_click_to_purchase_s"))
  }

  def queries: Map[String, Q] = Map(
    "q_funnel_windowed" -> (funnelWindowed _),
    "q_twap" -> (twapByType _),
    "q_session_paths" -> (sessionPaths _),
    "q_holt_trend" -> (holtTrend _),
    "q_ewma_daily" -> (ewmaDaily _),
    "q_ewma_sql" -> (ewmaSql _),
    "q_holt_sql" -> (holtSql _),
    "q_anomaly_zscore" -> (anomalyZscore _),
    "q_decayed_score" -> (decayedEngagement _),
    "q_event_transitions" -> (eventTransitions _),
    "q_gapfill_daily" -> (gapFilledDaily _),
    "q_retention" -> (retentionCohorts _)
  )

  def oracles: Map[String, String] = Map(
    "q_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS tv FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(tv) AS tv, min(t) AS tc
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND t > tv AND t <= tv + 21600000000000
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(tc) AS tc, min(t) AS tp
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND t > tc AND t <= tc + 21600000000000
        |      GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click_in_window,
        |  (SELECT count(*) FROM p) AS n_purchase_in_window,
        |  round((SELECT avg(tc - tv) FROM c) / 1e9, 3) AS avg_view_to_click_s,
        |  round((SELECT avg(tp - tc) FROM p) / 1e9, 3) AS avg_click_to_purchase_s""".stripMargin,
    "q_twap" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) AS tns, event_id, value FROM events),
        |d AS (SELECT event_type, value,
        |        lead(tns) OVER (PARTITION BY event_type ORDER BY tns, event_id) - tns AS dt
        |      FROM e)
        |SELECT event_type, count(*) AS n_intervals,
        |  round(sum(value * dt) / sum(dt), 6) AS twap,
        |  round(avg(value), 6) AS plain_avg
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events),
        |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM e),
        |s AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
        |                     THEN 1 ELSE 0 END AS new_s FROM l),
        |sid AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |        FROM s),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
        |       FROM sid),
        |p AS (SELECT user_id, sid, string_agg(event_type, '->' ORDER BY rn) AS path
        |      FROM rn WHERE rn <= 5 GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // recursive CTE, NOT list_reduce: DuckDB 1.0's list_reduce
    // mis-evaluates struct lambdas whose second field reads the
    // accumulator field the first just computed (verified: the 'b'
    // expression sees the NEW l from iteration 3 on) — a CTE row's
    // columns all reference the PREVIOUS row, so the coupled recursion
    // is safe, and the arithmetic mirrors the Spark fold op-for-op
    "q_holt_trend" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, datediff('day', DATE '1970-01-01', ts::DATE) AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(v ORDER BY d) AS vs FROM d GROUP BY 1),
        |r AS (
        |  SELECT event_type, vs, len(vs) AS n, 1 AS i,
        |    vs[1]::DOUBLE AS l, 0.0::DOUBLE AS b
        |  FROM s
        |  UNION ALL
        |  SELECT event_type, vs, n, i + 1,
        |    0.5::DOUBLE * vs[i + 1] + 0.5::DOUBLE * (l + b),
        |    0.3::DOUBLE * ((0.5::DOUBLE * vs[i + 1] + 0.5::DOUBLE * (l + b)) - l)
        |      + 0.7::DOUBLE * b
        |  FROM r WHERE i < n)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(l + 3.0 * b, 6) AS forecast_3
        |FROM r WHERE i = n ORDER BY event_type""".stripMargin,
    // identical arithmetic to q_ewma_daily / q_holt_trend — the Spark
    // side differs only in spelling (SQL function vs DataFrame fold)
    "q_ewma_sql" ->
      """WITH d AS (
        |  SELECT event_type, datediff('day', DATE '1970-01-01', ts::DATE) AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(v ORDER BY d) AS vs FROM d GROUP BY 1)
        |SELECT event_type, CAST(len(vs) AS BIGINT) AS n_days,
        |  round(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
        |FROM s ORDER BY event_type""".stripMargin,
    "q_holt_sql" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, datediff('day', DATE '1970-01-01', ts::DATE) AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(v ORDER BY d) AS vs FROM d GROUP BY 1),
        |r AS (
        |  SELECT event_type, vs, len(vs) AS n, 1 AS i,
        |    vs[1]::DOUBLE AS l, 0.0::DOUBLE AS b
        |  FROM s
        |  UNION ALL
        |  SELECT event_type, vs, n, i + 1,
        |    0.5::DOUBLE * vs[i + 1] + 0.5::DOUBLE * (l + b),
        |    0.3::DOUBLE * ((0.5::DOUBLE * vs[i + 1] + 0.5::DOUBLE * (l + b)) - l)
        |      + 0.7::DOUBLE * b
        |  FROM r WHERE i < n)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(l + 3.0 * b, 6) AS forecast_3
        |FROM r WHERE i = n ORDER BY event_type""".stripMargin,
    "q_ewma_daily" ->
      """WITH d AS (
        |  SELECT event_type, datediff('day', DATE '1970-01-01', ts::DATE) AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(v ORDER BY d) AS vs FROM d GROUP BY 1)
        |SELECT event_type, CAST(len(vs) AS BIGINT) AS n_days,
        |  round(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
        |FROM s ORDER BY event_type""".stripMargin,
    "q_decayed_score" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    datediff('day', DATE '1970-01-01', ts::DATE) AS d
        |  FROM events),
        |m AS (SELECT max(d) AS d_max FROM e)
        |SELECT user_id,
        | round(sum(value * power(0.5, (m.d_max - e.d) / 30.0)), 4) AS decayed_value,
        | count(*) AS n_events
        |FROM e, m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        | round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p_next
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH scored AS (
        |  SELECT event_type, value,
        |    avg(value) OVER w AS mu,
        |    stddev_samp(value) OVER w AS sd,
        |    count(*) OVER w AS n_win
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, (value - mu) / sd AS z FROM scored
        |  WHERE n_win >= 10 AND sd > 1e-9)
        |SELECT event_type, count(*) AS n_scored,
        |  sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
        |  round(max(abs(z)), 4) AS max_abs_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_gapfill_daily" ->
      """WITH b AS (SELECT min(o_orderdate::DATE) AS d0, max(o_orderdate::DATE) AS d1 FROM orders),
        |cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |d AS (SELECT o_orderdate::DATE AS day, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |      FROM orders GROUP BY 1)
        |SELECT strftime(cal.day, '%Y-%m-%d') AS day,
        | ifnull(d.n_orders, 0) AS n_orders,
        | ifnull(d.revenue, 0) AS revenue
        |FROM cal LEFT JOIN d USING (day) ORDER BY day""".stripMargin,
    "q_retention" ->
      """WITH a AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM a GROUP BY 1)
        |SELECT strftime(f.m0, '%Y-%m') AS cohort,
        | (year(a.m) - year(f.m0)) * 12 + (month(a.m) - month(f.m0)) AS offset_m,
        | count(DISTINCT a.o_custkey) AS n_active
        |FROM a JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
