package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.LakeSink

/** Suite pin for the twin-attempt output race TwinAttemptProbe drives at
  * volume: two attempts of ONE logical write alive simultaneously, both
  * mutating the filesystem for the same output — the writer and its
  * recovery twin (recoverAppendStages / vacuumDebris / a cold-started
  * sink replay). The probe measures; this spec keeps the protocol
  * honest under `sbt test` with one deterministic twin-finishes-first
  * interleave per shape (the harshest ordering: the writer resumes
  * against fully-recovered state).
  */
class TwinRaceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) =
    Files.createTempDirectory(s"graft_twinrace_$name").toString + "/t"

  private def rows(dir: String): Seq[(Long, String)] =
    LakeTable(spark, dir).read.select(col("id"), col("v"))
      .as[(Long, String)].collect().sorted.toSeq

  test("append twin: recovery completes the marked stage first; writer adopts, rows exact") {
    val dir = fresh("append")
    val lake = LakeTable(spark, dir)
    val seed = Seq((0L, "seed"), (1L, "seed"))
    lake.write(seed.toDF("id", "v").coalesce(1))
    val marked = new CountDownLatch(1)
    val recDone = new CountDownLatch(1)
    val recovered = new AtomicInteger
    lake.onStageMarkedForTest = () => {
      marked.countDown()
      assert(recDone.await(60, TimeUnit.SECONDS), "recovery twin hung")
    }
    val rec = new Thread(() => {
      marked.await(60, TimeUnit.SECONDS): Unit
      recovered.addAndGet(LakeTable(spark, dir).recoverAppendStages()): Unit
      recDone.countDown()
    }, "twinrace-append-recovery")
    rec.start()
    try lake.write(
      spark.range(100, 110).select(col("id"), lit("batch").as("v"))
        .repartition(3), SaveMode.Append)
    finally lake.onStageMarkedForTest = () => ()
    rec.join(60000)
    assert(recovered.get > 0, "the twin never recovered the marked stage")
    val expect = (seed ++ (100L until 110L).map(_ -> "batch")).sorted
    assert(rows(dir) == expect, "append twin lost or duplicated rows")
    // at most the documented spurious RECOVERED entry, never a third
    val attrs = LakeTable(spark, dir).history
      .select("operation").as[String].collect()
      .count(o => o == "WRITE APPEND" || o == "RECOVERED WRITE APPEND")
    assert(attrs >= 1 && attrs <= 2, s"append attributed $attrs times")
    LakeTable(spark, dir).vacuumDebris(): Unit
    assert(rows(dir) == expect, "vacuum changed data")
  }

  test("swap twin: vacuumDebris completes the marked swap first; exactly one commit") {
    val dir = fresh("swap")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((0L, "a"), (1L, "a"), (2L, "a")).toDF("id", "v").coalesce(1))
    val marked = new CountDownLatch(1)
    val vacDone = new CountDownLatch(1)
    lake.onSwapMarkedForTest = () => {
      marked.countDown()
      assert(vacDone.await(60, TimeUnit.SECONDS), "vacuum twin hung")
    }
    val vac = new Thread(() => {
      marked.await(60, TimeUnit.SECONDS): Unit
      LakeTable(spark, dir).vacuumDebris(): Unit
      vacDone.countDown()
    }, "twinrace-swap-vacuum")
    vac.start()
    try lake.upsert(Seq((1L, "U"), (5L, "n")).toDF("id", "v"), Seq("id"))
    finally lake.onSwapMarkedForTest = () => ()
    vac.join(60000)
    val expect = Seq((0L, "a"), (1L, "U"), (2L, "a"), (5L, "n"))
    assert(rows(dir) == expect, s"swap twin drifted: ${rows(dir)}")
    // swaps attribute EXACTLY once — the uuid-keyed adoption contract
    val merges = LakeTable(spark, dir).history
      .select("operation").as[String].collect()
      .count(o => o == "MERGE" || o == "RECOVERED MERGE")
    assert(merges == 1, s"swap attributed $merges times (uuid adoption broken)")
    // table stays fully usable
    LakeTable(spark, dir).write(
      Seq((9L, "z")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
    assert(rows(dir) == (expect :+ (9L -> "z")).sorted)
  }

  test("selective-delete twin: a recovery-completed delete still publishes its CDC set") {
    val dir = fresh("seldel")
    val lake = LakeTable(spark, dir)
    lake.write(spark.range(0, 40).select(col("id"), lit("a").as("v"))
      .repartitionByRange(4, col("id")))
    lake.collectStats(Seq("id")): Unit
    val marked = new CountDownLatch(1)
    val vacDone = new CountDownLatch(1)
    lake.onSwapMarkedForTest = () => {
      marked.countDown()
      assert(vacDone.await(60, TimeUnit.SECONDS), "vacuum twin hung")
    }
    val vac = new Thread(() => {
      marked.await(60, TimeUnit.SECONDS): Unit
      LakeTable(spark, dir).vacuumDebris(): Unit
      vacDone.countDown()
    }, "twinrace-seldel-vacuum")
    vac.start()
    try lake.delete(col("id") < 10, changeFeed = true)
    finally lake.onSwapMarkedForTest = () => ()
    vac.join(60000)
    assert(LakeTable(spark, dir).read.count() == 30)
    val dels = LakeTable(spark, dir).readChanges()
      .where(col("_change_type") === "delete").count()
    assert(dels == 10,
      s"twin-recovered delete published $dels change rows (want 10) — " +
        "the pending op must carry the change-stage claim")
  }

  test("sink twin: a cold-started replay of a live batch lands it exactly once") {
    val dir = fresh("sink")
    val app = "twinrace-app"
    val lake = LakeTable(spark, dir)
    LakeSink.writeBatch(lake, Seq((0L, "b0")).toDF("id", "v").coalesce(1), 0L, app)
    val marked = new CountDownLatch(1)
    val replayDone = new CountDownLatch(1)
    lake.onStageMarkedForTest = () => {
      marked.countDown()
      assert(replayDone.await(60, TimeUnit.SECONDS), "replay twin hung")
    }
    val original = new Thread(() =>
      LakeSink.writeBatch(lake,
        Seq((1L, "b1"), (2L, "b1")).toDF("id", "v").coalesce(1), 1L, app),
      "twinrace-sink-original")
    original.start()
    try {
      assert(marked.await(60, TimeUnit.SECONDS), "original never marked")
      // the "fresh process": cold replay cache, fresh table handle
      LakeSink.resetReplayCacheForTest()
      LakeSink.writeBatch(LakeTable(spark, dir),
        Seq((1L, "b1"), (2L, "b1")).toDF("id", "v").coalesce(1), 1L, app)
      replayDone.countDown()
      original.join(60000)
    } finally {
      lake.onStageMarkedForTest = () => ()
      LakeSink.resetReplayCacheForTest()
    }
    assert(rows(dir) == Seq((0L, "b0"), (1L, "b1"), (2L, "b1")),
      s"sink twin duplicated or lost the batch: ${rows(dir)}")
    assert(LakeTable(spark, dir).maxCommitParamLong(LakeSink.TxnKeyPrefix + app) == 1L)
  }
}
