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

  test("swap twin: writer commits inside the vacuum's complete->attribute window; one commit") {
    // the check-then-act hole the uuid adoption alone cannot close: the
    // vacuum twin finishes completeSwap, then the WRITER's commit lands
    // before the vacuum's attribution — a snapshot "already attributed?"
    // read on the vacuum side taken pre-writer-commit would answer no
    // and double-commit. commitIfAbsent's scan-then-claim-exactly-v
    // loop must adopt instead, in THIS ordering too.
    val dir = fresh("swapwin")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((0L, "a"), (1L, "a"), (2L, "a")).toDF("id", "v").coalesce(1))
    val marked = new CountDownLatch(1)
    val vacCompleted = new CountDownLatch(1)
    val writerCommitted = new CountDownLatch(1)
    val vacLake = LakeTable(spark, dir)
    vacLake.onVacuumPreAttributeForTest = () => {
      vacCompleted.countDown()
      assert(writerCommitted.await(60, TimeUnit.SECONDS), "writer hung")
    }
    lake.onSwapMarkedForTest = () => {
      marked.countDown()
      // resume the writer only once the vacuum twin holds the completed
      // swap with its attribution still pending
      assert(vacCompleted.await(60, TimeUnit.SECONDS), "vacuum twin hung")
    }
    val vac = new Thread(() => {
      marked.await(60, TimeUnit.SECONDS): Unit
      vacLake.vacuumDebris(): Unit
    }, "twinrace-swapwin-vacuum")
    vac.start()
    try lake.upsert(Seq((1L, "U"), (5L, "n")).toDF("id", "v"), Seq("id"))
    finally lake.onSwapMarkedForTest = () => ()
    writerCommitted.countDown()
    vac.join(60000)
    assert(!vac.isAlive, "vacuum twin did not finish")
    val expect = Seq((0L, "a"), (1L, "U"), (2L, "a"), (5L, "n"))
    assert(rows(dir) == expect, s"swap twin drifted: ${rows(dir)}")
    val merges = LakeTable(spark, dir).history
      .select("operation").as[String].collect()
      .count(o => o == "MERGE" || o == "RECOVERED MERGE")
    assert(merges == 1, s"swap attributed $merges times (adoption raced)")
  }

  test("commitIfAbsent: racing attributions of one key yield exactly one commit") {
    // the primitive under the adoption contract, hammered directly: N
    // threads race the same (key, value) against one log; exactly one
    // may win, every loser must adopt the winner's version
    val logDir = new org.apache.hadoop.fs.Path(fresh("cia"), LakeTable.LogDirName)
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val n = 8
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    val start = new CountDownLatch(1)
    val threads = (1 to n).map { i =>
      new Thread(() => {
        start.await(30, TimeUnit.SECONDS): Unit
        results.add(CommitLog.appendIfAbsent(
          fs, logDir, "RECOVERED MERGE", Map("swapStage" -> "k1", "t" -> i.toString),
          "swapStage", "k1", 0L)): Unit
      }, s"cia-$i")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.size == n, s"only ${rs.size}/$n attributions returned")
    assert(rs.count(_._2) == 1, s"${rs.count(_._2)} threads believe they committed")
    assert(rs.map(_._1).distinct.size == 1, s"divergent versions: $rs")
    // a different key commits fresh, above the first
    val (v2, byUs2) = CommitLog.appendIfAbsent(
      fs, logDir, "RECOVERED MERGE", Map("swapStage" -> "k2"), "swapStage", "k2", 0L)
    assert(byUs2 && v2 > rs.head._1)
    // and re-asking for k1 adopts, never re-commits
    val (v1b, byUs1b) = CommitLog.appendIfAbsent(
      fs, logDir, "RECOVERED MERGE", Map("swapStage" -> "k1"), "swapStage", "k1", 0L)
    assert(!byUs1b && v1b == rs.head._1)
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
