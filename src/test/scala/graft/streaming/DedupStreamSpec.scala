package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.LakeTable

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "river bank while morning mist settles across quiet water and tall " +
    "reeds sway gently under a pale early sky before the ferry arrives"
  private val other = "completely unrelated second story about volcanoes " +
    "glaciers deserts and the slow patient work of rivers carving canyons " +
    "through layered rock over millions of unhurried years without pause"

  test("near-dups are suppressed across micro-batches and restarts via the lake index") {
    val dir = Files.createTempDirectory("graft_dedup_stream")
    val src = s"$dir/src"
    def feed(rows: Seq[(Long, String)], f: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/$f")

    // batch 1: two novel docs + an in-batch near-dup of the first
    feed(Seq(
      (1L, base),
      (2L, other),
      (3L, base.replace("lazy dog", "lazy cat"))), "b1")
    val stream = spark.readStream.schema(schema).parquet(s"$src/*")
    val q = DedupStream.start(stream, s"$dir/idx", s"$dir/out",
      "doc_id", "text", trigger = Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      // batch 2: near-dup of doc 1 (cross-batch) + one novel doc
      feed(Seq(
        (10L, base.replace("quick brown", "swift brown")),
        (11L, "a genuinely new document about nothing seen before with " +
          "plenty of fresh words to avoid any accidental shingle overlap")), "b2")
      q.processAllAvailable()
    } finally q.stop()

    val admitted = LakeTable(spark, s"$dir/out").read
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 2L, 11L),
      s"expected {1,2,11} admitted, got $admitted")

    // "restart": a NEW query with a new checkpoint probes the same lake
    // index — state survived outside the stream
    feed(Seq((20L, base.replace("ferry", "barge"))), "b3")
    val stream2 = spark.readStream.schema(schema).parquet(s"$src/b3")
    val q2 = DedupStream.start(stream2, s"$dir/idx", s"$dir/out",
      "doc_id", "text", trigger = Trigger.ProcessingTime("1 second"))
    try q2.processAllAvailable() finally q2.stop()
    val after = LakeTable(spark, s"$dir/out").read
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after === Set(1L, 2L, 11L),
      s"near-dup of doc 1 leaked through the restarted stream: $after")
  }

  test("batch processBatch is the stream's dual") {
    val dir = Files.createTempDirectory("graft_dedup_batch")
    val b1 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, base.replace("lazy dog", "lazy cat")),
      (11L, "novel words entirely free of earlier phrasing and imagery " +
        "describing mountains trains harbors and late afternoon light")
    ).toDF("doc_id", "text")
    DedupStream.processBatch(b1, s"$dir/idx", s"$dir/out", "doc_id", "text",
      n = 3, threshold = 0.5)
    DedupStream.processBatch(b2, s"$dir/idx", s"$dir/out", "doc_id", "text",
      n = 3, threshold = 0.5)
    val admitted = LakeTable(spark, s"$dir/out").read
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 2L, 11L), s"got $admitted")
  }

  test("replayed micro-batch is idempotent (batchId-keyed appends)") {
    val dir = Files.createTempDirectory("graft_dedup_replay")
    val b = Seq((1L, base), (2L, other)).toDF("doc_id", "text")

    // simulate foreachBatch's at-least-once crash window: batch 0's
    // OUTPUT append committed (tagged with its batch id) but the process
    // died before the INDEX append
    LakeTable(spark, s"$dir/out").write(b, SaveMode.Append,
      extraParams = Map(LakeSink.TxnKeyPrefix + "graft-dedup" -> "0"))

    // replay of batch 0: must skip the output append, redo the index one
    DedupStream.processBatch(b, s"$dir/idx", s"$dir/out", "doc_id", "text",
      n = 3, threshold = 0.5, batchId = Some(0L))
    val out = LakeTable(spark, s"$dir/out")
    assert(out.read.count() === 2, "replay double-appended the output")
    val idx = LakeTable(spark, s"$dir/idx")
    assert(idx.exists && idx.read.count() > 0, "replay skipped the index append")
    val idxRows = idx.read.count()

    // replay of a FULLY applied batch: both appends are no-ops
    DedupStream.processBatch(b, s"$dir/idx", s"$dir/out", "doc_id", "text",
      n = 3, threshold = 0.5, batchId = Some(0L))
    assert(out.read.count() === 2)
    assert(idx.read.count() === idxRows)

    // a LATER batch with a near-dup of doc 1 still dedups normally
    val b1 = Seq((10L, base.replace("lazy dog", "lazy cat"))).toDF("doc_id", "text")
    DedupStream.processBatch(b1, s"$dir/idx", s"$dir/out", "doc_id", "text",
      n = 3, threshold = 0.5, batchId = Some(1L))
    assert(out.read.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
