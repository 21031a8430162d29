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
  * batch's commit is tagged with its batch id and a replayed batch that
  * already committed is skipped ([[LakeTable.hasCommitParam]]) instead of
  * double-appending — same discipline as [[DedupStream.processBatch]].
  */
object LakeSink {

  /** Start appending the stream to the lake table. */
  def streamTo(
      stream: DataFrame,
      lake: LakeTable,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(lake, batch.toDF(), batchId)
      }
      .trigger(trigger)
      .start()

  /** One micro-batch append, batchId-keyed for replay idempotence.
    * Factored out so the replay contract is directly testable.
    */
  def writeBatch(lake: LakeTable, batch: DataFrame, batchId: Long): Unit = {
    val tag = "streamBatchId" -> batchId.toString
    if (!batch.isEmpty && !lake.hasCommitParam(tag._1, tag._2)) {
      lake.write(batch, SaveMode.Append, extraParams = Map(tag)): Unit
    }
  }
}
