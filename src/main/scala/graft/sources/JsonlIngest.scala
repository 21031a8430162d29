package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines corpus ingest (SURVEY §2 A1's landing-zone family, extended
  * to the interchange format LLM corpora actually ship in — one JSON
  * object per line, the C4/RedPajama/Dolma distribution shape; the
  * reference's landing zone is CSV-only, 00-etl-rwd.py:43-45).
  *
  * Production contract mirrors [[CsvIngest]]: explicit schema, single
  * pass — `spark.read.json` without a schema runs a whole extra corpus
  * scan for inference, which at 100 TB doubles ingest cost. On top, JSONL
  * from a crawl pipeline is never fully clean, so the production reader
  * QUARANTINES instead of failing or silently nulling: good rows to the
  * lake, bad LINES kept verbatim (with their source file) for replay —
  * the ingest-time analog of the lake's DLT-style expectations
  * (`LakeTable.expect`), and the same contract as `badRecordsPath` on
  * the reference's platform.
  *
  * Why text + `from_json` rather than `spark.read.json` with a corrupt-
  * record column: filtering a JSON scan on its internal corrupt column
  * alone is disallowed (Spark requires caching the full parse first —
  * a non-starter for a 100 TB corpus), while a text scan parses each
  * line exactly once per leg with no cache and keeps the raw line
  * around verbatim for the quarantine. Both legs are map-only off the
  * same line scan; no shuffle until the caller aggregates. `.gz` inputs
  * decompress transparently but are unsplittable — one task per file —
  * so the landing zone should ship many medium files, never one giant
  * archive.
  */
object JsonlIngest {

  private val CorruptCol = "_graft_corrupt_line"

  /** Landing-zone convenience: schema inferred (extra pass — dev only). */
  def ingest(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Production path: explicit schema, single pass, malformed lines
    * dropped silently (DROPMALFORMED). Use [[readWithQuarantine]] when
    * the drop rate must be observable — on a crawl corpus it must.
    */
  def ingestAs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("mode", "DROPMALFORMED").schema(schema).json(path)

  /** Production path with observability: (good rows, quarantined lines).
    *
    * A line is quarantined when it fails JSON parse outright
    * (`from_json` yields NULL) or parses but violates the schema (the
    * corrupt-record slot is populated — e.g. a string where a bigint
    * belongs). The quarantine leg carries the verbatim line plus its
    * source file, so a fixed parser can replay exactly the dropped
    * input.
    */
  def readWithQuarantine(
      spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) = readWithQuarantine(spark, Seq(path), schema)

  /** [[readWithQuarantine]] over an explicit file list — the COPY INTO
    * integration point ([[LakeTable.copyIntoJsonlQuarantine]] feeds it
    * exactly the not-yet-loaded files).
    */
  def readWithQuarantine(
      spark: SparkSession, paths: Seq[String], schema: StructType):
      (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a $CorruptCol column")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.textFile(paths: _*).toDF("raw_line")
      .select(
        col("raw_line"),
        input_file_name().as("source_file"),
        from_json(col("raw_line"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    val bad = col("r").isNull || col(s"r.$CorruptCol").isNotNull
    val good = parsed.where(!bad)
      .select(schema.fieldNames.map(f => col(s"r.$f").as(f)).toIndexedSeq: _*)
    val quarantined = parsed.where(bad)
      .select(col("raw_line"), col("source_file"))
    (good, quarantined)
  }

  /** Streaming twin of [[readWithQuarantine]]: continuous landing-zone
    * ingest — files dropped into `path` are picked up by the file
    * source, parsed once per leg, and split good/quarantine with the
    * IDENTICAL predicate as the batch path (kappa contract: backfill
    * and live ingest run the same parse). Each leg is a separate
    * streaming query with its own checkpoint; the file source replays
    * deterministically, so the two legs always partition the same line
    * set even though they track progress independently.
    */
  def readStreamWithQuarantine(
      spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a $CorruptCol column")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    def parsed = spark.readStream.text(path)
      .select(
        col("value").as("raw_line"),
        input_file_name().as("source_file"),
        from_json(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    val bad = col("r").isNull || col(s"r.$CorruptCol").isNotNull
    // each leg gets its OWN source instance (def, not val): a streaming
    // DataFrame feeds one query; sharing a plan across two starts would
    // tie their checkpoints together
    val good = parsed.where(!bad)
      .select(schema.fieldNames.map(f => col(s"r.$f").as(f)).toIndexedSeq: _*)
    val quarantined = parsed.where(bad)
      .select(col("raw_line"), col("source_file"))
    (good, quarantined)
  }

  /** Write `df` as JSONL (one object per line — the interchange output
    * shape; JSON string escaping makes embedded newlines round-trip).
    */
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Continuous landing-zone -> lake pipeline: both quarantine legs
    * stream into lake tables through [[graft.streaming.LakeSink]], so
    * every micro-batch appends data AND a tagged commit — replayed batches
    * are skipped per leg (each leg runs its own query, its own appId
    * lineage, its own idempotence high-water mark). The quarantine
    * table is queryable/monitorable like any other lake table: a
    * dashboard alerting on its growth is the dropped-line observability
    * story running continuously.
    *
    * `checkpointDir` is REQUIRED (each leg checkpoints under its own
    * subdir) so batch ids are durable across invocations — that is what
    * makes the default appId safe. LakeSink's contract ties the appId to
    * a checkpoint lineage: a fresh (temp) checkpoint restarts batch ids
    * at 0, so re-running under the same appId would let the previous
    * run's high-water mark silently swallow every new file's batch. With
    * a durable checkpoint, a re-run continues the same lineage and new
    * landing files land as new batch ids.
    */
  def streamToLake(
      spark: SparkSession,
      jsonlPath: String,
      lakePath: String,
      quarantinePath: String,
      schema: StructType,
      checkpointDir: String,
      appId: String = "graft-jsonl-ingest",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()):
      (org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.streaming.StreamingQuery) = {
    val (good, bad) = readStreamWithQuarantine(spark, jsonlPath, schema)
    val cp = new org.apache.hadoop.fs.Path(checkpointDir)
    (graft.streaming.LakeSink.streamTo(
        good, LakeTable(spark, lakePath), appId = s"$appId-good", trigger = trigger,
        checkpointLocation = Some(new org.apache.hadoop.fs.Path(cp, "good").toString)),
      graft.streaming.LakeSink.streamTo(
        bad, LakeTable(spark, quarantinePath), appId = s"$appId-bad", trigger = trigger,
        checkpointLocation = Some(new org.apache.hadoop.fs.Path(cp, "bad").toString)))
  }

  /** JSONL landing files -> lake table + quarantine table, the
    * [[CsvIngest.ingestToLake]] pipeline shape with the quarantine leg
    * recorded beside the data (replayable after an upstream fix).
    */
  def ingestToLake(
      spark: SparkSession,
      jsonlPath: String,
      lakePath: String,
      quarantinePath: String,
      schema: StructType): (LakeTable, LakeTable) = {
    val (good, bad) = readWithQuarantine(spark, jsonlPath, schema)
    (LakeTable(spark, lakePath).write(good),
      LakeTable(spark, quarantinePath).write(bad))
  }
}
