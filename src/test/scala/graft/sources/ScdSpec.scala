package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Double, String, String, Boolean)*) =
    rows.toDF("id", "seg", "bal", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", when(col("valid_to") === "", lit(null)).otherwise(col("valid_to")))

  private def upd(rows: (Long, String, Double, String)*) =
    rows.toDF("id", "seg", "bal", "effective_date")

  private val keys = Seq("id")
  private val tracked = Seq("seg", "bal")

  test("changed row closes + reopens; unchanged is a no-op; new key inserts") {
    val cur = dim(
      (1L, "A", 10.0, "2024-01-01", "", true),
      (2L, "B", 20.0, "2024-01-01", "", true))
    val batch = upd(
      (1L, "A", 99.0, "2024-06-01"), // tracked change
      (2L, "B", 20.0, "2024-06-01"), // identical re-send
      (3L, "C", 30.0, "2024-06-01")) // brand-new key
    val out = Scd.applyType2(cur, batch, keys, tracked)
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), Option(r.getString(4)).getOrElse(""), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "A", 10.0, "2024-01-01", "2024-06-01", false), // closed, old values kept
      (1L, "A", 99.0, "2024-06-01", "", true),            // new open version
      (2L, "B", 20.0, "2024-01-01", "", true),            // untouched
      (3L, "C", 30.0, "2024-06-01", "", true)))           // insert
  }

  test("closed history passes through untouched; change detection is null-safe") {
    val cur = dim(
      (1L, "A", 10.0, "2023-01-01", "2024-01-01", false), // already closed
      (1L, "A", 11.0, "2024-01-01", "", true))
    val nullSeg = upd((1L, "A", 11.0, "2024-06-01"))
      .withColumn("seg", lit(null).cast("string"))
    val out = Scd.applyType2(cur, nullSeg, keys, tracked)
      .orderBy("id", "valid_from").collect()
    // null seg vs "A" IS a change (null-safe compare), closed row untouched
    assert(out.length === 3)
    assert(out(0).getString(3) === "2023-01-01" && !out(0).getBoolean(5))
    assert(out(1).getString(4) === "2024-06-01" && !out(1).getBoolean(5))
    assert(out(2).isNullAt(1) && out(2).getBoolean(5))
    // re-sending the SAME null-attr row is then a no-op
    val again = Scd.applyType2(
      Scd.applyType2(cur, nullSeg, keys, tracked), nullSeg, keys, tracked)
    assert(again.count() === 3)
  }

  test("asOf and pointInTimeJoin pick the version valid at each instant") {
    val hist = dim(
      (1L, "A", 10.0, "2024-01-01", "2024-04-01", false),
      (1L, "A", 20.0, "2024-04-01", "2024-07-01", false),
      (1L, "A", 30.0, "2024-07-01", "", true),
      (2L, "B", 5.0, "2024-01-01", "", true))
    // asOf mid-second-interval: version 2 of key 1, open row of key 2
    val at = Scd.asOf(hist, lit("2024-05-15")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(at === Seq((1L, 20.0), (2L, 5.0)))
    // boundary: an instant AT a version's start belongs to that version
    val boundary = Scd.asOf(hist, lit("2024-04-01")).where(col("id") === 1)
      .collect().map(_.getDouble(2)).toSeq
    assert(boundary === Seq(20.0))

    val facts = Seq((1L, "2024-02-10"), (1L, "2024-06-30"), (1L, "2024-07-01"),
      (2L, "2024-12-31")).toDF("id", "t")
    val joined = Scd.pointInTimeJoin(facts, hist, Seq("id"), "t")
      .select(col("id"), col("t"), col("bal")).orderBy("id", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(joined === Seq(
      (1L, "2024-02-10", 10.0), (1L, "2024-06-30", 20.0),
      (1L, "2024-07-01", 30.0), (2L, "2024-12-31", 5.0)),
      "each fact must carry the dimension attributes of ITS OWN time")
  }

  test("duplicate update keys in one batch are rejected") {
    val cur = dim((1L, "A", 10.0, "2024-01-01", "", true))
    val dup = upd((1L, "A", 1.0, "2024-06-01"), (1L, "A", 2.0, "2024-06-01"))
    val e = intercept[IllegalArgumentException] {
      Scd.applyType2(cur, dup, keys, tracked)
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("scd2Batch: replay is skipped — a re-sent batch must not close the row it opened") {
    val path = java.nio.file.Files.createTempDirectory("graft_scd_stream").resolve("d").toString
    val lake = LakeTable(spark, path)
    lake.write(dim((1L, "A", 10.0, "2024-01-01", "", true)),
      org.apache.spark.sql.SaveMode.Overwrite)
    val b0 = upd((1L, "A", 20.0, "2024-03-01"))
    graft.streaming.LakeSink.scd2Batch(lake, b0, 0L, keys, tracked)
    assert(lake.read.count() === 2)
    // replay the SAME batch id with drifted content (a later effective
    // date would open a spurious version if applied) — must be skipped
    // on the id alone
    val replayed = upd((1L, "A", 20.0, "2024-04-01"))
    graft.streaming.LakeSink.scd2Batch(lake, replayed, 0L, keys, tracked)
    assert(lake.read.count() === 2, "replayed batch id must be skipped entirely")
    // multi-version batch: orderCol keeps only the latest row per key
    val b1 = upd((1L, "A", 30.0, "2024-05-01"), (1L, "A", 40.0, "2024-06-01"))
    graft.streaming.LakeSink.scd2Batch(lake, b1, 1L, keys, tracked,
      orderCol = Some("effective_date"))
    val open = lake.read.where(col("is_current")).collect()
    assert(open.length === 1 && open.head.getDouble(2) === 40.0)
    assert(lake.read.count() === 3)
  }

  test("scd2To: a CDC parquet stream builds Type-2 history exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd_to")
    val src = s"$dir/src"
    upd((1L, "A", 20.0, "2024-03-01"), (2L, "B", 5.0, "2024-03-01"))
      .coalesce(1).write.parquet(s"$src/b1")
    val lake = LakeTable(spark, s"$dir/t")
    lake.write(dim((1L, "A", 10.0, "2024-01-01", "", true)),
      org.apache.spark.sql.SaveMode.Overwrite)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("seg", "string").add("bal", "double")
      .add("effective_date", "string")
    val q = graft.streaming.LakeSink.scd2To(
      spark.readStream.schema(schema).parquet(s"$src/*"),
      lake, keys, tracked, orderCol = Some("effective_date"))
    assert(q.awaitTermination(120000))
    val rows = lake.read.orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getDouble(2),
        Option(r.getString(4)).getOrElse(""), r.getBoolean(5)))
    assert(rows.toSeq === Seq(
      (1L, 10.0, "2024-03-01", false),
      (1L, 20.0, "", true),
      (2L, 5.0, "", true)))
  }

  test("applyToLake: two sequential batches build history, commit log records SCD2") {
    val path = java.nio.file.Files.createTempDirectory("graft_scd").resolve("d").toString
    val lake = LakeTable(spark, path)
    lake.write(dim((1L, "A", 10.0, "2024-01-01", "", true)), SaveMode.Overwrite)
    Scd.applyToLake(lake, upd((1L, "A", 20.0, "2024-03-01")), keys, tracked)
    Scd.applyToLake(lake, upd(
      (1L, "A", 30.0, "2024-06-01"),
      (2L, "B", 5.0, "2024-06-01")), keys, tracked)
    val rows = lake.read.orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getDouble(2),
        Option(r.getString(4)).getOrElse(""), r.getBoolean(5)))
    assert(rows.toSeq === Seq(
      (1L, 10.0, "2024-03-01", false),
      (1L, 20.0, "2024-06-01", false),
      (1L, 30.0, "", true),
      (2L, 5.0, "", true)))
    // each batch is one commit: WRITE + SCD2 + SCD2
    val ops = lake.history.select("operation").as[String].collect()
    assert(ops.count(_ == "SCD2") === 2)
  }

  test("applyChanges: latest sequence wins, deletes remove, re-delivery idempotent, ties rejected") {
    val s2 = spark
    import s2.implicits._
    val lake = LakeTable(spark,
      java.nio.file.Files.createTempDirectory("graft_cdc").resolve("t").toString)
      .write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"))
    // out-of-order feed: id 1 updated (seq 2) then a LATE older update
    // (seq 1, must lose); id 2 updated then deleted (delete wins); id 4
    // inserted; id 5 delete of an absent key (no-op); plus an exact
    // duplicate re-delivery of the id-1 winner
    val feed = Seq(
      (1L, "a1-late", 11.0, "upsert", 1L),
      (1L, "a2", 12.0, "upsert", 2L),
      (1L, "a2", 12.0, "upsert", 2L), // exact re-delivery
      (2L, "b9", 29.0, "upsert", 1L),
      (2L, "b", 0.0, "delete", 2L),
      (4L, "d", 40.0, "upsert", 1L),
      (5L, "x", 0.0, "delete", 1L)
    ).toDF("id", "name", "v", "_op", "_seq")
    Scd.applyChanges(lake, feed, Seq("id"), sequenceCol = "_seq")
    assert(lake.read.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // applying the SAME feed again converges (CDC replay safety)
    Scd.applyChanges(lake, feed, Seq("id"), sequenceCol = "_seq")
    assert(lake.read.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // a CONTENT-differing tie on (key, seq) is ambiguous and errors
    val tie = Seq(
      (7L, "p", 1.0, "upsert", 9L),
      (7L, "q", 2.0, "upsert", 9L)
    ).toDF("id", "name", "v", "_op", "_seq")
    val e = intercept[IllegalArgumentException] {
      Scd.applyChanges(lake, tie, Seq("id"), sequenceCol = "_seq")
    }
    assert(e.getMessage.contains("tied"), e.getMessage)
    // the SQL spelling (DLT's statement) routes to the same fold
    Seq((3L, "c-sql", 33.0, "upsert", 5L), (4L, "d", 0.0, "delete", 5L))
      .toDF("id", "name", "v", "_op", "_seq")
      .createOrReplaceTempView("cdc_sql_feed")
    spark.sql(s"APPLY CHANGES INTO graft_lake('${lake.path}') " +
      "FROM cdc_sql_feed KEYS (id) SEQUENCE BY _seq")
    assert(lake.read.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a2", 12.0), (3L, "c-sql", 33.0)))
  }

  test("applyChangesStream continuously replicates a change feed into a downstream table") {
    val s2 = spark
    import s2.implicits._
    def dir(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdcrep_$tag").resolve("t").toString
    val src = LakeTable(spark, dir("src"))
      .write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"))
    val replica = LakeTable(spark, dir("dst")).write(src.read)
    // seed the feed so the streaming source has a schema to read
    src.update(Map("v" -> lit(11.0)), col("id") === 1L, changeFeed = true)
    def state(l: LakeTable) = l.read.orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    val q = Scd.applyChangesStream(src, replica, Seq("id"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(state(replica) === state(src), "replica stale after seed update")
      // a delete, then an upsert batch (update + brand-new key) — the
      // update's preimage/postimage pair must resolve postimage-wins
      src.delete(col("id") === 2L, changeFeed = true)
      src.upsert(Seq((3L, "c2", 31.0), (4L, "d", 40.0)).toDF("id", "name", "v"),
        Seq("id"), changeFeed = true)
      q.processAllAvailable()
      assert(state(replica) === state(src), "replica stale after delete+upsert")
      assert(state(replica) ===
        Seq((1L, "a", 11.0), (3L, "c2", 31.0), (4L, "d", 40.0)))
    } finally q.stop()
  }
}
