package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.LakeTable

/** Streaming sink into a [[LakeTable]] (SURVEY §2 L6 depth): each
  * micro-batch appends parquet AND a commit-log entry, so a streaming
  * ingest produces the same history/optimize/read surface as batch writes
  * — the "stream into the lake, query as a table" pattern.
  *
  * foreachBatch delivers batches at-least-once on restart; the append is
  * made IDEMPOTENT the way Delta's txnAppId/txnVersion sinks are: every
  * batch's commit is tagged `streamTxn:<appId> -> <batchId>` and a batch
  * at or below the max recorded version for THAT appId is skipped instead
  * of double-appended. The appId scoping matters for correctness, not
  * just hygiene: with an unscoped tag, a SECOND streaming query appending
  * to the same table (its own checkpoint, so its batch ids restart at 0)
  * would match the first query's tags and silently drop its batches.
  *
  * The appId names a CHECKPOINT LINEAGE (Delta's txnAppId contract):
  * restarting from the same checkpoint must reuse the appId (batch ids
  * continue, replays are skipped); starting over with a FRESH checkpoint
  * must use a new appId (batch ids reset to 0, and the old high-water
  * mark would otherwise suppress every new batch).
  *
  * Crash exactness: appends land through a MARKED private stage
  * ([[graft.sources.LakeTable]] appendViaStage) whose pending op carries
  * this sink's txn tag, and [[coldStart]] completes any interrupted
  * promotion BEFORE reading the tag high-water mark — so a batch whose
  * process died between data promotion and the tagged commit is
  * recovered-and-attributed, then SKIPPED by the replay, instead of
  * re-appended as a duplicate. This closes the "data landed, tag
  * didn't" window the sink previously documented as a known gap
  * (KillProbe + the CrashInjectionSpec tagged-append walk pin it).
  */
object LakeSink {

  /** Prefix of the commit-param key carrying a sink's batch version. */
  val TxnKeyPrefix = "streamTxn:"

  /** Last applied batch id per (table path, appId), seeded by one
    * O(commits) log scan and tracked in memory after — a long-running
    * stream commits per batch, and re-scanning the whole log every batch
    * would cost O(n^2) cumulative driver I/O over the stream's life.
    * Safe under the lake layer's single-writer-per-table assumption.
    */
  private val seen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** First touch of a (table, appId) lineage in this process — i.e. a
    * sink (re)start: complete any promotion a crashed predecessor left
    * marked, THEN read the tag high-water mark. Order is the exactly-once
    * closure: the recovery's RECOVERED commit carries the crashed batch's
    * tag, so the mark read below sees it and the replay skips the batch.
    */
  private def coldStart(lake: LakeTable, key: String): Long = {
    lake.recoverAppendStages(): Unit
    lake.maxCommitParamLong(key)
  }

  /** Drop the in-memory high-water cache — crash tests use this to make
    * the next writeBatch behave like a fresh process (re-seed from the
    * log, re-run cold-start recovery).
    */
  private[graft] def resetReplayCacheForTest(): Unit = seen.clear()

  /** Start appending the stream to the lake table.
    *
    * @param appId stable identifier of this query's checkpoint lineage;
    *              distinct queries appending to the same table MUST pass
    *              distinct appIds
    * @param autoCompactEvery run [[LakeTable.compactSmall]] after every
    *        N applied batches (Delta autoCompact analogue) — a
    *        long-running append stream is the small-file factory, and
    *        the selective compaction's cost tracks the recent small
    *        files, not the table. Compaction is maintenance, not data:
    *        a crash between append and compact loses nothing, and the
    *        replay skip keeps batch ids unaffected.
    */
  def streamTo(
      stream: DataFrame,
      lake: LakeTable,
      appId: String = "graft-lake-sink",
      trigger: Trigger = Trigger.AvailableNow(),
      autoCompactEvery: Option[Int] = None,
      autoRefreshStats: Boolean = false,
      checkpointLocation: Option[String] = None
  ): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(lake, batch.toDF(), batchId, appId)
        autoCompactEvery.foreach(n =>
          if (n > 0 && batchId % n == n - 1) lake.compactSmall(): Unit)
        if (autoRefreshStats) refreshStatsIfPresent(lake)
      }
      .trigger(trigger)
    checkpointLocation.foreach(cp => writer.option("checkpointLocation", cp))
    writer.start()
  }

  /** One micro-batch append, (appId, batchId)-keyed for replay
    * idempotence. Factored out so the replay contract is directly
    * testable.
    */
  def writeBatch(
      lake: LakeTable, batch: DataFrame, batchId: Long,
      appId: String = "graft-lake-sink"): Unit = {
    val key = TxnKeyPrefix + appId
    val cacheKey = lake.path + "\u0000" + appId
    val last: Long = seen.computeIfAbsent(cacheKey, _ => coldStart(lake, key))
    if (batchId <= last) return
    if (!batch.isEmpty) {
      // a FAILED append may still have passed its point of no return (a
      // marked stage that recovery will complete-and-attribute), so the
      // warm cache must not survive the failure: evicting it forces the
      // same-process retry back through coldStart, which completes the
      // marked stage and SEES its recovered tag — without this the retry
      // trusted the stale high-water mark and re-appended a batch whose
      // first attempt later lands via recovery (a duplicate no forked-
      // process replay could reproduce, since fresh processes always
      // cold-start)
      try lake.write(batch, SaveMode.Append, extraParams = Map(key -> batchId.toString)): Unit
      catch { case t: Throwable => seen.remove(cacheKey): Unit; throw t }
      // only COMMITTED versions advance the mark: an empty batch leaves
      // no commit, so a replay of it must still fall through to the
      // (no-op) write rather than claim the id was applied
      seen.merge(cacheKey, batchId, (a, b) => math.max(a, b)): Unit
    }
  }

  /** Start appending the stream WITH EXPECTATIONS (the streaming DLT
    * idiom): each micro-batch runs the table's CHECK constraints,
    * violating rows divert to the `<path>__quarantine` sibling with
    * their `_violated` labels, and only the clean remainder lands —
    * [[graft.sources.LakeTable.appendExpecting]] running continuously.
    * Together with `JsonlIngest.streamToLake` this completes the
    * quarantine ladder: lines that don't PARSE quarantine at ingest,
    * rows that parse but violate the CONTRACT quarantine here, and both
    * audit trails are ordinary lake tables a drop-rate alert can watch.
    *
    * Replay contract: the CLEAN leg is exactly-once — its commit
    * carries the (appId, batchId) tag, so a redelivered batch is
    * skipped whole. The QUARANTINE leg is at-least-once, and the write
    * ORDER makes that true: the quarantine append commits BEFORE the
    * tagged clean commit (LakeTable.appendExpecting), so a crash
    * landing between the two leaves the tag uncommitted and the replay
    * re-runs the whole batch — re-quarantining its violations (dedupe
    * downstream on content if the audit count must be exact, the same
    * window DLT's expectation metrics have) rather than skipping them
    * forever.
    */
  def streamToExpecting(
      stream: DataFrame,
      lake: LakeTable,
      appId: String = "graft-lake-expect",
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        expectingBatch(lake, batch.toDF(), batchId, appId)
      }
      .trigger(trigger)
      .start()

  /** One micro-batch of [[streamToExpecting]] — [[writeBatch]]'s replay
    * skip around the constraint-gated split.
    */
  def expectingBatch(
      lake: LakeTable, batch: DataFrame, batchId: Long,
      appId: String = "graft-lake-expect"): Unit = {
    val key = TxnKeyPrefix + appId
    val cacheKey = lake.path + "\u0000" + appId
    val last: Long = seen.computeIfAbsent(cacheKey, _ => coldStart(lake, key))
    if (batchId <= last) return
    if (!batch.isEmpty) {
      // same warm-retry eviction as [[writeBatch]]: the clean leg lands
      // through the marked append stage, so a failure past the mark must
      // send the retry back through coldStart
      try lake.appendExpecting(batch, extraParams = Map(key -> batchId.toString)): Unit
      catch { case t: Throwable => seen.remove(cacheKey): Unit; throw t }
      seen.merge(cacheKey, batchId, (a, b) => math.max(a, b)): Unit
    }
  }

  /** Start UPSERTING the stream into the lake table — the Delta
    * "stream-MERGE" pattern (`foreachBatch` + `MERGE INTO`): each
    * micro-batch's rows update matching keys in place and insert the
    * rest, so the table holds the LATEST state per key rather than the
    * append history. The canonical CDC-apply / latest-snapshot shape.
    *
    * Same (appId, batchId) replay contract as [[streamTo]]: the MERGE's
    * commit carries the txn tag, so an at-least-once redelivery after a
    * restart is recognized and skipped instead of re-merged. A re-merge
    * of a whole-row upsert is VALUE-idempotent anyway, but skipping also
    * keeps the history/CDC stream exactly-once — a replayed batch must
    * not mint a second commit version.
    *
    * A batch may carry several rows per key (two updates to one entity
    * inside one trigger interval); `orderCol`, when given, keeps only
    * the LAST version per key (max `orderCol` wins) before merging —
    * the per-batch compaction Delta users hand-write with
    * `row_number()` in their foreachBatch.
    */
  /** @param autoRefreshStats incrementally re-stat after each applied
    *        batch ([[LakeTable.refreshStats]] — scans ONLY files without
    *        a stats row). Without this, every selective merge leaves its
    *        replacement files unstatted, so a long-running CDC stream
    *        gradually loses the file pruning that makes its own batches
    *        cheap; with it, the steady state holds: each batch rewrites
    *        a few files and re-stats exactly those. No-op until
    *        `collectStats` has run once.
    */
  def upsertTo(
      stream: DataFrame,
      lake: LakeTable,
      keys: Seq[String],
      appId: String = "graft-lake-upsert",
      orderCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      autoRefreshStats: Boolean = false
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        upsertBatch(lake, batch.toDF(), batchId, keys, appId, orderCol)
        if (autoRefreshStats) refreshStatsIfPresent(lake)
      }
      .trigger(trigger)
      .start()

  /** Incremental [[LakeTable.refreshStats]], but only when the table has
    * stats at all — a sink must not fail because nobody ran
    * `collectStats` yet.
    */
  private def refreshStatsIfPresent(lake: LakeTable): Unit =
    try lake.refreshStats(): Unit
    catch { case _: IllegalArgumentException | _: IllegalStateException => }

  /** Start applying the stream to a TYPE-2 dimension ([[graft.sources.Scd]]):
    * each micro-batch closes changed open rows and opens new versions,
    * building full attribute history from a CDC feed — the streaming
    * warehouse-dimension pattern. Same (appId, batchId) replay contract
    * as the other sinks; unlike the whole-row upsert, a replayed SCD2
    * batch is NOT value-idempotent (it would close the row it just
    * opened with a same-date version), so the txn skip is load-bearing
    * for correctness here, not just for history hygiene.
    *
    * `orderCol` compacts multi-version batches to the latest row per key
    * first — REQUIRED when a trigger interval can deliver two updates to
    * one entity (Scd.applyType2 rejects duplicate keys per batch).
    */
  def scd2To(
      stream: DataFrame,
      lake: LakeTable,
      keys: Seq[String],
      tracked: Seq[String],
      effectiveCol: String = "effective_date",
      appId: String = "graft-lake-scd2",
      orderCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        scd2Batch(lake, batch.toDF(), batchId, keys, tracked, effectiveCol, appId, orderCol)
      }
      .trigger(trigger)
      .start()

  /** One micro-batch SCD2 apply, (appId, batchId)-keyed — see [[scd2To]]. */
  def scd2Batch(
      lake: LakeTable, batch: DataFrame, batchId: Long,
      keys: Seq[String], tracked: Seq[String],
      effectiveCol: String = "effective_date",
      appId: String = "graft-lake-scd2",
      orderCol: Option[String] = None): Unit = {
    val key = TxnKeyPrefix + appId
    val cacheKey = lake.path + "\u0000" + appId
    val last: Long = seen.computeIfAbsent(cacheKey, _ => lake.maxCommitParamLong(key))
    if (batchId <= last) return
    if (!batch.isEmpty) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val compacted = orderCol.fold(batch) { oc =>
        batch
          .withColumn("__graft_rn", row_number().over(
            Window.partitionBy(keys.map(col): _*).orderBy(col(oc).desc)))
          .filter(col("__graft_rn") === 1)
          .drop("__graft_rn")
      }
      graft.sources.Scd.applyToLake(lake, compacted, keys, tracked, effectiveCol,
        extraParams = Map(key -> batchId.toString)): Unit
      seen.merge(cacheKey, batchId, (a, b) => math.max(a, b)): Unit
    }
  }

  /** One micro-batch MERGE, (appId, batchId)-keyed — see [[upsertTo]].
    *
    * No [[coldStart]] here (nor in [[scd2Batch]]), deliberately: a MERGE
    * lands through the staged swap, whose tagged commit is atomic with
    * the data (the pending op carries the tag, so vacuumDebris's
    * completion attributes it) — there is no promoted-but-untagged
    * window to heal. A swap crashed mid-flight holds the stage claim;
    * the restarted merge gets the documented clean
    * ConcurrentModificationException until the operator runs
    * vacuumDebris — self-healing that claim here would be UNSAFE, since
    * under multi-writer contention (CrossProcessProbe phase B2) the
    * claim holder may be a live peer, not our crashed predecessor.
    */
  def upsertBatch(
      lake: LakeTable, batch: DataFrame, batchId: Long, keys: Seq[String],
      appId: String = "graft-lake-upsert",
      orderCol: Option[String] = None): Unit = {
    val key = TxnKeyPrefix + appId
    val cacheKey = lake.path + "\u0000" + appId
    val last: Long = seen.computeIfAbsent(cacheKey, _ => lake.maxCommitParamLong(key))
    if (batchId <= last) return
    if (!batch.isEmpty) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val compacted = orderCol.fold(batch) { oc =>
        batch
          .withColumn("__graft_rn", row_number().over(
            Window.partitionBy(keys.map(col): _*).orderBy(col(oc).desc)))
          .filter(col("__graft_rn") === 1)
          .drop("__graft_rn")
      }
      lake.upsert(compacted, keys,
        extraParams = Map(key -> batchId.toString)): Unit
      seen.merge(cacheKey, batchId, (a, b) => math.max(a, b)): Unit
    }
  }
}
