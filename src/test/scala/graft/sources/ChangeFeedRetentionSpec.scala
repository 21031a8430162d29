package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Change-feed lifecycle at scale: retention (`vacuumChanges`) so the CDC
  * feed doesn't grow forever, and bounded replay (`maxFilesPerTrigger`)
  * so a new consumer doesn't get the whole backlog as one micro-batch.
  */
class ChangeFeedRetentionSpec extends SparkSpec {
  import spark.implicits._

  /** A lake table with three change-feed-enabled upserts (change sets at
    * commit versions 1, 2, 3 on top of the version-0 seed write).
    */
  private def seeded(): (String, LakeTable) = {
    val root = Files.createTempDirectory("graft_cdf_retention").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    lake.upsert(Seq((1L, 11.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    lake.upsert(Seq((3L, 30.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    lake.upsert(Seq((2L, 21.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    (root, lake)
  }

  test("vacuumChanges trims the feed to the retained window and logs it") {
    val (_, lake) = seeded()
    assert(lake.readChanges().select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    lake.vacuumChanges(retainLast = 1)
    // cutoff = latest(3) - 1 = 2: v1 and v2 gone, v3 kept
    assert(lake.readChanges().select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(3L))
    val entry = lake.history.where(col("operation") === "VACUUM CHANGES")
    assert(entry.count() === 1)
    assert(entry.select("operationParameters.removedVersions")
      .head.getString(0) === "1,2")
    // idempotent: nothing left below the cutoff
    lake.vacuumChanges(retainLast = 1)
    assert(lake.readChanges().select("_commit_version")
      .distinct().count() === 1)
  }

  test("explicit resume below the vacuum horizon fails loudly, not partially") {
    val (_, lake) = seeded()
    lake.vacuumChanges(retainLast = 1) // removes sets v1, v2; horizon = 2
    // resuming from history that no longer exists would silently drop
    // changes (an incremental consumer would diverge) — must throw, and
    // NOT as IllegalArgumentException, which MaterializedAgg.refresh
    // treats as the benign "no change sets recorded in range"
    val e = intercept[IllegalStateException] {
      lake.readChanges(fromVersion = 2)
    }
    assert(e.getMessage.contains("vacuumed through version 2"))
    // at or above the floor both bounded and open reads still work
    assert(lake.readChanges(fromVersion = 3).select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(3L))
    assert(lake.readChanges().select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("timestamp resume points resolve through the commit log, Delta-style") {
    val (_, lake) = seeded()
    // the commit log's own stamps are the mapping's ground truth
    val stamp = lake.history
      .select(col("version"), col("timestamp"))
      .collect().map(r => r.getLong(0) -> java.time.Instant.parse(r.getString(1)))
      .toMap
    // from v2's own stamp: sets 2 and 3
    assert(lake.readChanges(stamp(2L)).select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(2L, 3L))
    // closed interval [v2, v2]: exactly set 2
    assert(lake.readChanges(stamp(2L), stamp(2L)).select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(2L))
    // a stamp beyond the last commit is an error, not an empty batch —
    // a consumer asking for the future has a bug it should hear about.
    // IllegalSTATE: IllegalArgument is the documented benign "no change
    // sets in range" signal that MaterializedAgg.refresh swallows
    val e = intercept[IllegalStateException] {
      lake.readChanges(stamp(3L).plusSeconds(3600))
    }
    assert(e.getMessage.contains("beyond the table's history"))
    // the SQL TVF takes the same timestamp form
    val viaSql = spark.sql(
      s"SELECT DISTINCT _commit_version FROM graft_changes('${lake.path}', '${stamp(2L)}')")
      .collect().map(_.getLong(0)).toSet
    assert(viaSql === Set(2L, 3L))
    // mixed version/timestamp bounds are rejected, like table_changes
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('${lake.path}', 1, '${stamp(2L)}')")
        .collect()
    }
    // a timestamp resume below the vacuum horizon fails like the
    // version form does — the mapping must not bypass the guard
    lake.vacuumChanges(retainLast = 1)
    intercept[IllegalStateException] {
      lake.readChanges(stamp(1L))
    }
    // …including a stamp from BEFORE the table began: it maps to
    // version 0, which the version form treats as best-effort, but an
    // explicit timestamp promised the complete feed since that instant
    intercept[IllegalStateException] {
      lake.readChanges(stamp(0L).minusSeconds(3600))
    }
  }

  test("checkpointed CDC consumer keeps exactly-once across a feed vacuum") {
    val (root, lake) = seeded()
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
    // 3 single-row upserts: one update (pre+post), one insert, one update
    val first = drain()
    assert(first === 5)
    // vacuum behind the consumer, then one more change set
    lake.vacuumChanges(retainLast = 1)
    lake.upsert(Seq((4L, 40.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    // the resumed consumer sees ONLY the new set — no re-delivery, no
    // failure over the files that no longer exist (it already read them)
    assert(drain() === first + 1)
  }

  test("maxFilesPerTrigger replays the backlog as bounded micro-batches") {
    val (root, lake) = seeded()
    val batches = new AtomicInteger(0)
    val rows = new AtomicLong(0L)
    val q = lake.readChangesStream(maxFilesPerTrigger = Some(1))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_bounded")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty) {
          batches.incrementAndGet(): Unit
          rows.addAndGet(b.count()): Unit
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    // one file per batch: at least one batch per change set, same total
    assert(batches.get() >= 3)
    assert(rows.get() === 5L)
    intercept[IllegalArgumentException] {
      lake.readChangesStream(maxFilesPerTrigger = Some(0))
    }
  }

  test("data readStream honors the same maxFilesPerTrigger bound") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_stream_bound").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 1.0)).toDF("id", "x"))
    lake.write(Seq((2L, 2.0)).toDF("id", "x"), org.apache.spark.sql.SaveMode.Append)
    lake.write(Seq((3L, 3.0)).toDF("id", "x"), org.apache.spark.sql.SaveMode.Append)
    val batches = new AtomicInteger(0)
    val q = lake.readStream(maxFilesPerTrigger = Some(1))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet(): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(batches.get() >= 3)
  }
}
