package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.LakeTable
import graft.text.Dedup

/** Streaming NEAR-dup suppression against a growing standing index — the
  * continuous-ingest shape of [[graft.text.Dedup.incrementalNearDup]]:
  * every micro-batch is probed against the MinHash index of everything
  * admitted so far (across batches AND restarts, because the index is a
  * lake table, not in-memory state), survivors are appended to the output
  * table, and THEIR signatures are appended to the index.
  *
  * This is what `dropDuplicates`-style streaming state can't express:
  * near-duplicate (not exact-key) matching, against a corpus that
  * predates the stream, with state that lives in the lake instead of a
  * state store — at 100 TB of admitted corpus the index table is the only
  * thing a new batch touches.
  *
  * Within-batch near-dups are also collapsed (smallest id survives) so
  * two copies arriving together don't both pass.
  */
object DedupStream {

  /** Tables whose crashed-append recovery already ran in this process —
    * one directory listing per table per process, not per micro-batch.
    */
  private val recovered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Start the dedup stream.
    *
    * @param docs       streaming DataFrame with `idCol` (long) + `textCol`
    * @param indexPath  lake path of the standing index (created if absent)
    * @param outPath    lake path for admitted (novel) docs
    */
  def start(
      docs: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      appId: String = "graft-dedup"
  ): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch.toDF(), indexPath, outPath, idCol, textCol, n, threshold,
            batchId = Some(batchId), appId = appId)
        }
      }
      .trigger(trigger)
      .start()

  /** One micro-batch: probe, collapse within-batch dups, append survivors
    * + their signatures. Factored out so batch jobs can run the identical
    * logic (the batch/stream dual discipline used across this engine).
    *
    * foreachBatch replays micro-batches at-least-once, so with a
    * `batchId` the two appends are made IDEMPOTENT the way Delta's
    * txnAppId/txnVersion sinks are: each append tags its commit
    * `streamTxn:<appId> -> <batchId>` ([[LakeSink.TxnKeyPrefix]]) and a
    * replay checks the max recorded version for that appId before
    * re-applying — a crash between the output append and the index append
    * replays into "skip output, redo index" instead of double-admitting
    * the batch. (The replayed `novel` set is identical because the index
    * it probes is in the same pre-append state.) The appId scopes the
    * check to THIS query's checkpoint lineage, so a second stream feeding
    * the same tables (its own batch ids from 0) is never suppressed by
    * this one's tags; a fresh checkpoint needs a fresh appId.
    */
  def processBatch(
      batch: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      batchId: Option[Long] = None,
      appId: String = "graft-dedup"): Unit = {
    val spark = batch.sparkSession
    val indexLake = LakeTable(spark, indexPath)
    val outLake = LakeTable(spark, outPath)
    val key = LakeSink.TxnKeyPrefix + appId
    // cold-start recovery BEFORE the replay check, once per table per
    // process (LakeSink.coldStart's contract): a crash between a marked
    // append's promotion and its tagged commit must surface as the
    // RECOVERED commit's tag here, not as "never applied" -> re-append
    Seq(outLake, indexLake).foreach { l =>
      if (recovered.add(l.path)) l.recoverAppendStages(): Unit
    }
    def applied(lake: LakeTable): Boolean =
      batchId.exists(b => lake.exists && lake.maxCommitParamLong(key) >= b)
    if (applied(outLake) && applied(indexLake)) return // full replay: no-op

    // 1. suppress docs near-duplicating the ADMITTED corpus
    val vsCorpus =
      if (indexLake.exists) {
        val hits = Dedup.incrementalNearDup(
          batch, indexLake.read, idCol, textCol, n, threshold)
          .select(col("new_id").as(idCol)).distinct()
        batch.join(hits, Seq(idCol), "left_anti")
      } else batch
    // 2. collapse within-batch near-dup clusters: the smallest id of each
    //    pair survives (pairs are sparse; batch is small by definition)
    val intra = Dedup.minhashBandedPairs(vsCorpus, idCol, textCol, n, threshold)
      .select(col("b_id").as(idCol)).distinct()
    val novel = vsCorpus.join(intra, Seq(idCol), "left_anti")

    if (!novel.isEmpty) {
      val tag = batchId.map(b => Map(key -> b.toString)).getOrElse(Map.empty)
      if (!applied(outLake))
        outLake.write(novel, SaveMode.Append, extraParams = tag): Unit
      if (!applied(indexLake))
        indexLake.write(
          Dedup.buildMinhashIndex(novel, idCol, textCol, n),
          SaveMode.Append, extraParams = tag): Unit
    }
  }
}
