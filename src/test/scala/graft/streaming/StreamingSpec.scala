package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Tables

/** L1–L5 streaming behavior via the memory sink: the stream must agree with
  * its batch dual, drop late data past the watermark, dedup within the
  * watermark, and keep custom per-key state.
  */
class StreamingSpec extends SparkSpec {

  /** events.parquet copied into its own dir (file-source needs a directory). */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(
      Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming tumbling agg equals the batch dual (complete mode)") {
    // complete mode emits every window at end-of-input; append mode would
    // hold back the final windows the watermark never passes
    val stream = EventsAnalytics.readStream(spark, eventsDir)
    val got = runToMemory(
      EventsAnalytics.tumblingHourly(stream), "t_tumbling", "complete")
      .orderBy("window_start_us", "event_type").collect().map(_.toSeq)
    val expected = EventsAnalytics.qTumbling(spark, sf0001)
      .collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
  }

  test("streaming session windows equal the batch dual (complete mode)") {
    val stream = EventsAnalytics.readStream(spark, eventsDir)
    val got = runToMemory(
      EventsAnalytics.sessions(
        stream.withWatermark("ts_ts", "10 minutes")), "t_sessions", "complete")
      .orderBy("user_id", "session_start_us").collect().map(_.toSeq)
    val expected = EventsAnalytics.qSessions(spark, sf0001)
      .collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
  }

  test("append-mode watermarked tumbling emits only watermark-passed windows, all matching batch") {
    val stream = EventsAnalytics.readStream(spark, eventsDir)
    val got = runToMemory(
      EventsAnalytics.streamTumbling(stream), "t_tumbling_append", "append")
      .collect().map(_.toSeq).toSet
    val batch = EventsAnalytics.qTumbling(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(batch), s"streamed windows disagree with batch: ${got -- batch}")
  }

  test("streaming dedup removes duplicate event_ids within the watermark") {
    // duplicate the whole file -> every event_id appears twice
    val dir = Files.createTempDirectory("graft_events_dup")
    Files.copy(Paths.get(s"$sf0001/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf0001/events.parquet"), dir.resolve("b.parquet"))
    val stream = EventsAnalytics.readStream(spark, dir.toString)
    val got = runToMemory(
      EventsAnalytics.streamDedup(stream).select("event_id"), "t_dedup", "append")
    val n = Tables(spark, sf0001).events.count()
    assert(got.count() === n, "each event_id must survive exactly once")
  }

  test("watermark drops events later than 10 minutes behind the max ts") {
    import spark.implicits._
    // batch 1: events at T0+1h; batch 2: one event 2h earlier (far past
    // the watermark) plus one current -> late one dropped from the agg
    val dir = Files.createTempDirectory("graft_events_late")
    val t0 = 1700000000000000000L // epoch nanos
    def mk(rows: Seq[(Long, Long, Long, String, Double, String)], f: String) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$f")
    mk(Seq((1L, t0 + 3600L * 1000000000L, 1L, "a", 1.0, "{}")), "b1")
    val stream = EventsAnalytics.readStream(spark, s"$dir/*")
    val q = EventsAnalytics.streamTumbling(stream).writeStream
      .outputMode("append").format("memory").queryName("t_late")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      q.processAllAvailable() // watermark advances to T0+1h-10m
      mk(Seq(
        (2L, t0 - 3600L * 1000000000L, 1L, "late", 9.9, "{}"), // 2h late
        (3L, t0 + 3610L * 1000000000L, 1L, "a", 2.0, "{}")
      ), "b2")
      q.processAllAvailable()
      mk(Seq((4L, t0 + 7300L * 1000000000L, 1L, "a", 1.0, "{}")), "b3")
      q.processAllAvailable() // push watermark past T0+1h windows to emit them
    } finally q.stop()
    val types = spark.table("t_late").select("event_type")
      .collect().map(_.getString(0)).toSet
    assert(!types.contains("late"), s"late event leaked: $types")
    assert(types.contains("a"))
  }

  test("stream-stream join: purchases joined to views within the watermark") {
    val s1 = EventsAnalytics.readStream(spark, eventsDir)
    val purchases = s1.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts_ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val s2 = EventsAnalytics.readStream(spark, eventsDir)
    val views = s2.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("ts_ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("p_ts"))
    val got = runToMemory(joined.select("p_id", "v_id"), "t_ssjoin", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch dual
    val ev = Tables(spark, sf0001).events
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts_ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts_ts").as("v_ts"))
    val expected = p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select("p_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "need signal")
    assert(got === expected)
  }

  test("foreachBatch sink receives every micro-batch exactly once (L6)") {
    val stream = EventsAnalytics.readStream(spark, eventsDir)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = stream.select("event_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(batch.count()): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(seen.get() === Tables(spark, sf0001).events.count())
  }

  test("streaming into a LakeTable appends data + commits, then reads back as a table") {
    val lakeDir = Files.createTempDirectory("graft_lake_sink").resolve("events").toString
    val lake = graft.sources.LakeTable(spark, lakeDir)
    val q = LakeSink.streamTo(
      EventsAnalytics.readStream(spark, eventsDir).drop("ts_ts"), lake)
    q.awaitTermination(120000)
    val n = Tables(spark, sf0001).events.count()
    assert(lake.read.count() === n)
    val ops = lake.history.select("operation").collect().map(_.getString(0))
    assert(ops.forall(_ == "WRITE APPEND"), ops.toSeq)
    // the lake table is a normal batch table now: aggregate it
    assert(lake.read.groupBy("event_type").count().count() === 5)
  }

  test("LakeTable.readStream: appends flow to a checkpointed consumer exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lake_src")
    val lake = graft.sources.LakeTable(spark, s"$root/t")
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    def drain(): Unit = {
      val q = lake.readStream.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    drain()
    assert(spark.read.parquet(out).count() === 2)
    lake.write(Seq((3L, "c")).toDF("id", "v"), org.apache.spark.sql.SaveMode.Append)
    drain() // restart from the checkpoint: only the new append delivers
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("LakeSink replayed micro-batch is skipped, not double-appended") {
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft_lake_sink_replay").resolve("t").toString
    val lake = graft.sources.LakeTable(spark, lakeDir)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    LakeSink.writeBatch(lake, b0, batchId = 0L)
    assert(lake.read.count() === 2)
    // at-least-once replay of the SAME batch id: no second append
    LakeSink.writeBatch(lake, b0, batchId = 0L)
    assert(lake.read.count() === 2, "replayed batch double-appended")
    // a genuinely new batch still lands
    LakeSink.writeBatch(lake, Seq((3L, "c")).toDF("id", "v"), batchId = 1L)
    assert(lake.read.count() === 3)
  }

  test("LakeSink: batch ids are scoped per appId — a second query is never suppressed") {
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft_lake_sink_apps").resolve("t").toString
    val lake = graft.sources.LakeTable(spark, lakeDir)
    LakeSink.writeBatch(lake, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      batchId = 0L, appId = "app-a")
    assert(lake.read.count() === 2)
    // a SECOND query (fresh checkpoint, batch ids from 0) appending to the
    // same table: an unscoped tag would match app-a's batch 0 and drop this
    LakeSink.writeBatch(lake, Seq((3L, "c")).toDF("id", "v"),
      batchId = 0L, appId = "app-b")
    assert(lake.read.count() === 3, "second query's batch 0 was wrongly suppressed")
    // replay within each lineage still skips
    LakeSink.writeBatch(lake, Seq((3L, "c")).toDF("id", "v"),
      batchId = 0L, appId = "app-b")
    LakeSink.writeBatch(lake, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      batchId = 0L, appId = "app-a")
    assert(lake.read.count() === 3, "replayed batch double-appended")
  }

  test("LakeSink.upsertBatch: merge applies, replay skips, orderCol compacts per key") {
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft_lake_sink_upsert").resolve("t").toString
    val lake = graft.sources.LakeTable(spark, lakeDir)
    lake.write(Seq((1L, "stale", 0L), (2L, "stale", 0L)).toDF("id", "v", "seq"))

    // batch with TWO versions of key 1 — orderCol keeps the max-seq row
    val b0 = Seq((1L, "mid", 5L), (1L, "new", 9L), (3L, "c", 1L)).toDF("id", "v", "seq")
    LakeSink.upsertBatch(lake, b0, batchId = 0L, keys = Seq("id"), orderCol = Some("seq"))
    def state() = lake.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state() === Seq((1L, "new"), (2L, "stale"), (3L, "c")))
    val versions = lake.history.count()

    // at-least-once replay: no new commit version, state unchanged
    LakeSink.upsertBatch(lake, b0, batchId = 0L, keys = Seq("id"), orderCol = Some("seq"))
    assert(lake.history.count() === versions, "replayed merge minted a commit")
    assert(state() === Seq((1L, "new"), (2L, "stale"), (3L, "c")))

    // next batch updates in place (no append growth) and inserts
    LakeSink.upsertBatch(lake, Seq((2L, "fresh", 1L), (4L, "d", 1L)).toDF("id", "v", "seq"),
      batchId = 1L, keys = Seq("id"), orderCol = Some("seq"))
    assert(state() === Seq((1L, "new"), (2L, "fresh"), (3L, "c"), (4L, "d")))
  }

  test("upsert stream with autoRefreshStats keeps file pruning alive across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_autostat")
    val lake = graft.sources.LakeTable(spark, s"$dir/t")
    (0 until 4).foreach { b =>
      lake.write((b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i"))
        .toDF("id", "v").coalesce(1), org.apache.spark.sql.SaveMode.Append)
    }
    lake.collectStats(Seq("id"))
    def statted(): Long = spark.read.parquet(s"$dir/t/_graft_stats").count()
    val before = statted()

    // two selective point-upserts with per-batch refresh: the replacement
    // files regain stats rows, so the SECOND batch still prunes
    LakeSink.upsertBatch(lake, Seq((150L, "X")).toDF("id", "v"), 0L, Seq("id"))
    lake.refreshStats()
    assert(statted() >= before, "replacement files must be re-statted")
    LakeSink.upsertBatch(lake, Seq((155L, "Y")).toDF("id", "v"), 1L, Seq("id"))
    val merges = lake.history.where(col("operation") === "MERGE")
      .select("operationParameters.selective").collect().map(_.getString(0))
    assert(merges.forall(_ == "true"),
      "both batches must take the selective path (second depends on the refresh)")
    assert(lake.read.count() === 400)
  }

  test("LakeSink.upsertTo: stream converges to latest state per key") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_to")
    val src = s"$dir/src"
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "seq")
      .coalesce(1).write.parquet(s"$src/b1")
    val lake = graft.sources.LakeTable(spark, s"$dir/t")
    lake.write(Seq((1L, "zero", 0L)).toDF("id", "v", "seq"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "string").add("seq", "long")
    val q = LakeSink.upsertTo(
      spark.readStream.schema(schema).parquet(s"$src/*"),
      lake, keys = Seq("id"), orderCol = Some("seq"))
    assert(q.awaitTermination(120000))
    val got = lake.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b")))
  }

  test("checkpointed query restarts with no duplicates and no loss (exactly-once recovery)") {
    import spark.implicits._
    // LakeSink's doc claims exactly-once across restarts via the
    // checkpoint; this drives it: run a checkpointed parquet-sink query,
    // STOP it, feed more data, restart from the same checkpoint, and
    // compare against the batch dual.
    val root = Files.createTempDirectory("graft_restart")
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    def mk(rows: Seq[(Long, Long, Long, String, Double, String)], f: String) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/$f")
    def runOnce(): Unit = {
      val q = EventsAnalytics.readStream(spark, s"$src/*")
        .select("event_id", "user_id", "event_type", "value")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      // returns false on timeout WITHOUT stopping the query — asserting
      // keeps a slow run from racing a second query on the same checkpoint
      assert(q.awaitTermination(120000), "streaming query did not finish in time")
    }
    val t0 = 1700000000000000000L
    mk(Seq(
      (1L, t0, 1L, "a", 1.0, "{}"),
      (2L, t0 + 1000000000L, 2L, "b", 2.0, "{}")), "b1")
    runOnce() // processes batch 1, then terminates — a planned "crash"
    mk(Seq(
      (3L, t0 + 2000000000L, 1L, "c", 3.0, "{}"),
      (4L, t0 + 3000000000L, 3L, "a", 4.0, "{}")), "b2")
    runOnce() // recovery: checkpoint offsets must skip b1, pick up b2
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // no loss (all four), no dup (each exactly once): a restart that
    // re-read b1 would surface 1,1,2,2,...; one that lost offsets mid-way
    // would miss 3,4
    assert(ids === Seq(1L, 2L, 3L, 4L))
  }

  test("streamToExpecting: violating rows quarantine continuously; replay skips the clean leg") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream_expect")
    val src = s"$root/src"
    val lake = graft.sources.LakeTable(spark, s"$root/t")
    lake.write(Seq((0L, 1.0)).toDF("id", "v"))
    lake.addConstraint("v_pos", "v > 0")
    Seq((1L, 2.0), (2L, -5.0), (3L, 4.0)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    val q = LakeSink.streamToExpecting(
      spark.readStream.schema(lake.read.schema).parquet(s"$src/*"), lake,
      appId = "expect-spec")
    assert(q.awaitTermination(120000))
    // clean rows landed, the violator did not
    assert(lake.read.select("id").as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 3L))
    // …and it sits in the quarantine sibling with its label
    val quarantined = lake.quarantine.read
      .select("id", "_violated").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(quarantined.toSeq === Seq((2L, "v_pos")))
    // a REPLAYED batch id is skipped whole (no second commit, no dup)
    LakeSink.expectingBatch(lake,
      Seq((1L, 2.0), (2L, -5.0), (3L, 4.0)).toDF("id", "v"), 0L, "expect-spec")
    assert(lake.read.count() === 3L)
  }

  test("streaming CDC apply: foreachBatch upserts micro-batches into a lake table") {
    val ev = Tables(spark, sf0001).events.drop("ts_ts")
    val lakeDir = Files.createTempDirectory("graft_cdc").resolve("t").toString
    val lake = graft.sources.LakeTable(spark, lakeDir)
    // seed with STALE rows for half the events (value zeroed) — the
    // stream must overwrite them and insert the rest
    lake.write(ev.where(col("user_id") < 75).withColumn("value", lit(0.0)))
    val stale = lake.read.where(col("value") =!= 0.0).count()
    assert(stale === 0)
    val q = EventsAnalytics.readStream(spark, eventsDir).drop("ts_ts")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        lake.upsert(batch, Seq("event_id")): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    // converged to the batch truth: same rows, stale values gone
    assert(lake.read.count() === ev.count())
    val got = lake.read.agg(round(sum("value"), 4)).head.getDouble(0)
    val want = ev.agg(round(sum("value"), 4)).head.getDouble(0)
    assert(got === want)
  }

  test("change feed streams to a CDC consumer exactly once across restarts") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_cdf_stream")
    val lake = graft.sources.LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    lake.upsert(Seq((1L, 11.0), (3L, 3.0)).toDF("id", "x"), Seq("id"),
      changeFeed = true)
    def drain(): Long = {
      val q = lake.readChangesStream
        .writeStream.format("parquet")
        .option("path", s"$root/sink")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      spark.read.parquet(s"$root/sink").count()
    }
    // first run: pre+post for id=1, insert for id=3
    assert(drain() === 3)
    // a later merge adds a new version dir; the restarted consumer picks
    // up ONLY the new files (checkpointed file-source offsets)
    lake.merge(Seq((2L, 0.0)).toDF("id", "x"), Seq("id"),
      whenMatched = Seq(
        graft.sources.MergeClause.DeleteWhen(Some(col("s.x") === 0.0))),
      insertUnmatched = false, changeFeed = true)
    assert(drain() === 4)
    val byType = spark.read.parquet(s"$root/sink")
      .groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L, "delete" -> 1L))
    // version stamps recovered from the file paths
    assert(spark.read.parquet(s"$root/sink")
      .select("_commit_version").distinct().count() === 2)
  }

  test("transformWithState running totals match batch groupBy (RocksDB store)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventsAnalytics.readStream(spark, eventsDir)
      val updates = runToMemory(
        EventsAnalytics.runningUserTotalsTws(spark, stream).toDF(),
        "t_tws", "update")
      val finalRows = updates
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_events").desc)))
        .where(col("rn") === 1)
        .select("user_id", "n_events")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = Tables(spark, sf0001).events
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalRows === expected)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming EWMA matches the batch fold over ts-ordered values (RocksDB)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventsAnalytics.readStream(spark, eventsDir)
      val updates = runToMemory(
        EventsAnalytics.streamingEwma(spark, stream).toDF(), "t_ewma", "update")
      val finalRows = updates
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy(col("n_events").desc)))
        .where(col("rn") === 1)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // the reference: the identical fold over the batch table's
      // ts-ordered values per type
      val expected = graft.core.Tables(spark, sf0001).events
        .select(col("event_type"), col("ts"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k, rows) =>
          val vs = rows.sortBy(_._2).map(_._3)
          k -> (vs.length.toLong,
            vs.tail.foldLeft(vs.head)((acc, x) => 0.25 * x + 0.75 * acc))
        }
      assert(finalRows.keySet === expected.keySet)
      finalRows.foreach { case (k, (n, e)) =>
        assert(n === expected(k)._1, s"$k count")
        // identical op sequence when the file source delivers in one
        // batch -> exact; allow ulps in case the source splits batches
        assert(math.abs(e - expected(k)._2) < 1e-9, s"$k ewma $e vs ${expected(k)._2}")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState running totals match batch groupBy") {
    val stream = EventsAnalytics.readStream(spark, eventsDir)
    val updates = runToMemory(
      EventsAnalytics.runningUserTotals(spark, stream).toDF(),
      "t_state", "update")
    // last update per user = final totals
    val finalRows = updates
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)))
      .where(col("rn") === 1)
      .select("user_id", "n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables(spark, sf0001).events
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalRows === expected)
  }
}
