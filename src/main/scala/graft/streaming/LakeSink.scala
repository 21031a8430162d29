package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.LakeTable

/** Streaming sink into a [[LakeTable]] (SURVEY §2 L6 depth): each
  * micro-batch appends parquet AND a commit-log entry, so a streaming
  * ingest produces the same history/optimize/read surface as batch writes
  * — the "stream into the lake, query as a table" pattern.
  *
  * foreachBatch gives at-least-once batch delivery on restart without a
  * checkpointed exactly-once file sink; for the exactly-once path Spark's
  * built-in parquet `writeStream.format("parquet")` + checkpoint works on
  * the same directory (the commit log is additive metadata either way).
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
        if (!batch.isEmpty) {
          lake.write(batch.toDF(), SaveMode.Append): Unit
        }
      }
      .trigger(trigger)
      .start()
}
