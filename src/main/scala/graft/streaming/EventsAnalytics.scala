package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.core.Tables

/** Event-stream analytics (SURVEY §2 L-rows): every aggregation is written
  * once against a DataFrame and runs BOTH as a batch query (the oracle-
  * matched dual) and as a Structured Streaming query (readStream + watermark
  * + windowed state) — the batch/stream duality Spark's unified Dataset API
  * gives for free, which is exactly the property worth preserving at scale:
  * the same window logic backfills 100 TB of history and then tails the
  * live stream.
  *
  * Window starts are emitted as `unix_micros` bigints: integer epoch values
  * compare engine-agnostically (no timestamp-rendering divergence).
  */
object EventsAnalytics {

  /** Schema of the events table as read with nanosAsLong (ts = epoch nanos). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** L1 (tumbling): hourly counts+sums per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** L1 (sliding): 1-hour windows sliding every 15 minutes. */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** L2: 30-minute-gap session windows per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("s.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  /** Events stream from a parquet directory (file source), with the same
    * ts_ts derivation as the batch table. The file source needs a
    * declared schema; a one-off batch sniff of the directory picks up
    * whichever `ts` encoding the files carry (nano bigint or micro
    * timestamp — see [[Tables.canonicalizeEventTs]]), then the stream
    * normalizes to the canonical nano bigint.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // an empty / not-yet-populated source dir (the normal deploy order
    // for file-source streams) can't be sniffed — fall back to the
    // declared nano schema so the stream still starts and picks files
    // up as they land
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => eventsSchema }
    Tables.canonicalizeEventTs(
        spark.readStream.schema(fileSchema).parquet(dir))
      .withColumn("ts_ts", Tables.nanosToTimestamp(col("ts")))
  }

  /** L1+L3 streaming: watermarked tumbling aggregation (append mode emits a
    * window once the watermark passes it; late data beyond 10min dropped).
    */
  def streamTumbling(stream: DataFrame): DataFrame =
    tumblingHourly(stream.withWatermark("ts_ts", "10 minutes"))

  /** L2 streaming: watermarked session windows. */
  def streamSessions(stream: DataFrame): DataFrame =
    sessions(stream.withWatermark("ts_ts", "10 minutes"))

  /** L4: streaming dedup by event_id within the watermark. */
  def streamDedup(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** L5: custom per-key state via flatMapGroupsWithState — a running
    * (count, sum) per user emitted on every update. The state is one small
    * case class per key: bounded memory, scales with |users| not |events|.
    */
  def runningUserTotals(
      spark: SparkSession,
      stream: DataFrame
  ): Dataset[UserRunning] = {
    import spark.implicits._
    val typed = stream
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserRunning(user, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** L5 via Spark 4's transformWithState API (the successor to
    * flatMapGroupsWithState): same running per-user totals, state kept in
    * a typed ValueState backed by the RocksDB state store — the
    * arbitrary-state path with per-key TTL/timer support that a long-lived
    * 100 TB stream needs.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserRunning] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var state: ValueState[UserRunning] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "totals", org.apache.spark.sql.Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = Option(state.get()).getOrElse(UserRunning(user, 0L, 0.0))
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { case (_, v) => n += 1; tot += v }
      val next = UserRunning(user, n, tot)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** L5 (transformWithState flavor); requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`).
    */
  def runningUserTotalsTws(
      spark: SparkSession,
      stream: DataFrame
  ): Dataset[UserRunning] = {
    import spark.implicits._
    stream
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  case class KeyEwma(event_type: String, n_events: Long, ewma: Double)

  /** Streaming per-key EWMA — [[graft.analytics.Behavior.ewmaDaily]]'s
    * long-lived stream twin: the smoothed value updates continuously in
    * a typed ValueState instead of being refit over history. Rows fold
    * in EVENT-TIME order WITHIN each micro-batch (the batch op's
    * day-ordered discipline); across batches the fold follows arrival
    * order, which equals event order for an in-order source — the
    * standard trade every streaming smoother makes (reordering beyond
    * the batch boundary would need the full history the smoother exists
    * to avoid).
    */
  class EwmaProcessor(alpha: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Double), KeyEwma] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var state: ValueState[KeyEwma] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyEwma](
        "ewma", org.apache.spark.sql.Encoders.product[KeyEwma], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[KeyEwma] = {
      val sorted = rows.toArray.sortBy(_._2)
      val prev = Option(state.get())
      var n = prev.map(_.n_events).getOrElse(0L)
      var e = prev.map(_.ewma).getOrElse(0.0)
      sorted.foreach { case (_, _, v) =>
        e = if (n == 0L) v else alpha * v + (1.0 - alpha) * e
        n += 1
      }
      val out = KeyEwma(key, n, e)
      state.update(out)
      Iterator.single(out)
    }
  }

  /** L5 surface for [[EwmaProcessor]] (RocksDB state store, like
    * [[runningUserTotalsTws]]).
    */
  def streamingEwma(
      spark: SparkSession,
      stream: DataFrame,
      alpha: Double = 0.25
  ): Dataset[KeyEwma] = {
    import spark.implicits._
    stream
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new EwmaProcessor(alpha),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ---------- declared batch queries ----------

  type Q = (SparkSession, String) => DataFrame

  def qTumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumblingHourly(Tables(spark, sfDir).events)
      .orderBy(col("window_start_us"), col("event_type"))

  def qSliding(spark: SparkSession, sfDir: String): DataFrame =
    slidingHourly(Tables(spark, sfDir).events)
      .orderBy(col("window_start_us"), col("event_type"))

  def qSessions(spark: SparkSession, sfDir: String): DataFrame =
    sessions(Tables(spark, sfDir).events)
      .orderBy(col("user_id"), col("session_start_us"))

  /** Per-user activity profile: events, distinct types, value stats. */
  def qUserActivity(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 2).as("total_value"),
        unix_micros(max(col("ts_ts"))).as("last_seen_us"))
      .orderBy(col("user_id"))

  /** Batch dual of the L4 streaming dedup: a doubled event feed (every
    * event delivered twice — the at-least-once delivery the streaming
    * `dropDuplicatesWithinWatermark` exists for) deduped by event_id back
    * to exact tumbling counts. The oracle aggregates the CLEAN feed, so
    * the row would mismatch if dedup under- or over-dropped. Duplicate
    * rows are byte-identical, so the nondeterministic dropDuplicates
    * survivor is still deterministic content.
    */
  def qStreamDedupDual(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    tumblingHourly(ev.unionByName(ev).dropDuplicates("event_id"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** Batch dual of the L-category STREAM-STREAM interval join (pinned
    * equal to the watermarked streaming run in StreamingSpec): purchases
    * joined to same-user views within the 10 minutes before the
    * purchase. An equi-join on user_id with a range post-filter — one
    * key shuffle, no cross product; the streaming twin bounds its state
    * with 1-hour watermarks on both sides.
    */
  def qStreamJoinDual(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).eventsRaw
      .withColumn("ts_us",
        floor(col("ts").cast("decimal(38,0)") / lit(1000)).cast("long"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts_us").as("p_us"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("v_id"), col("ts_us").as("v_us"))
    p.join(v, Seq("user_id"))
      .where(col("v_us") >= col("p_us") - lit(600000000L) && col("v_us") <= col("p_us"))
      .select(col("p_id"), col("v_id"), (col("p_us") - col("v_us")).as("gap_us"))
      .orderBy(col("p_id"), col("v_id"))
  }

  def queries: Map[String, Q] = Map(
    "q_stream_dedup_dual" -> (qStreamDedupDual _),
    "q_stream_join_dual" -> (qStreamJoinDual _),
    "q_events_tumbling" -> (qTumbling _),
    "q_events_sliding" -> (qSliding _),
    "q_events_sessions" -> (qSessions _),
    "q_events_user_activity" -> (qUserActivity _)
  )

  def oracles: Map[String, String] = Map(
    "q_stream_join_dual" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_us
        |           FROM events WHERE event_type = 'view')
        |SELECT p_id, v_id, p_us - v_us AS gap_us
        |FROM p JOIN v USING (user_id)
        |WHERE v_us >= p_us - 600000000 AND v_us <= p_us
        |ORDER BY p_id, v_id""".stripMargin,
    "q_stream_dedup_dual" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sliding" ->
      """SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS window_start_us,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) ks
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        | count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q_events_user_activity" ->
      """SELECT user_id, count(*) AS n_events,
        | count(DISTINCT event_type) AS n_types,
        | round(sum(value), 2) AS total_value,
        | epoch_us(max(ts)) AS last_seen_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
