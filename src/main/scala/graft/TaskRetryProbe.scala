package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable
import graft.streaming.LakeSink
import graft.text.InvertedIndex

/** Task-level failure injection probe (not part of the driver contract).
  *
  * Every crash gate so far kills the DRIVER (CrashInjectionSpec's fuse,
  * KillProbe's SIGKILLs); the custom promotion/manifest machinery had
  * never seen a duplicated or retried TASK ATTEMPT — the failure mode a
  * 1000-executor cluster produces daily (executor loss, speculation).
  * This probe runs a dedicated session with `spark.task.maxFailures=4`
  * and AGGRESSIVE SPECULATION (quantile 0.2, multiplier 1.05 — static
  * SparkContext confs, which is why this is a main, not a SparkSpec
  * suite sharing the test context), plants a one-time task fault
  * (attempt-number-gated throw, so attempt 0 of one partition dies and
  * its retry passes) inside each write path, and asserts exactly-once
  * content after the retries:
  *
  *   - append:  a multi-file `appendViaStage` write (the staged
  *              promotion under a task retry + concurrent speculative
  *              attempts of the same task writing twin output files)
  *   - sink:    a LakeSink.writeBatch micro-batch (the exactly-once
  *              replay contract with a retried task inside the batch)
  *   - upsert:  a staged-swap CDC merge (rewrite job under retry)
  *   - fold:    an index-maintenance fold (via
  *              InvertedIndex.foldSourceDecoratorForTest)
  *
  * Retries are PROVEN, not assumed: a SparkListener counts failed task
  * attempts, and each scenario asserts its fault actually fired
  * (injected-failure count > 0). HONEST LIMIT: Spark's speculation
  * scheduler is hard-disabled in local mode (TaskSchedulerImpl starts
  * it only when `!isLocal`), so the slow-task bait in the append
  * scenario cannot provoke a live speculative duplicate here — the
  * confs and the bait stay in so the probe exercises the real cluster
  * behavior when pointed at one, and the listener records
  * `speculative_attempts` either way (expected 0 locally). What IS
  * proven locally: a failed attempt's retry re-runs against the
  * committer's already-arbitrated output, and every path lands its
  * batch exactly once.
  *
  * Usage: runMain graft.TaskRetryProbe
  */
object TaskRetryProbe {

  /** Executor-side injection state — local mode shares the JVM, so a
    * static is visible to tasks. `mode` names the armed scenario;
    * attempt 0 of partition 0 throws (exactly once per arming, since
    * the retry arrives as attempt 1).
    */
  object Inject {
    @volatile var mode: String = ""
    val fired = new AtomicInteger(0)
    def guard(tag: String, id: Long): Long = {
      val tc = TaskContext.get()
      if (mode == tag && tc != null && tc.attemptNumber() == 0 &&
        tc.partitionId() == 0) {
        fired.incrementAndGet()
        throw new RuntimeException(s"injected task failure: $tag")
      }
      id
    }
    /** Speculation bait: attempt 0 of partition 1 sleeps ONCE PER TASK
      * ATTEMPT (the udf runs per row — an unconditional sleep would
      * stretch the task by rows x delay), so the scheduler launches a
      * speculative twin; both race to commit.
      */
    private val slept =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int, Int)]()
    def slow(tag: String, id: Long): Long = {
      val tc = TaskContext.get()
      if (mode == tag && tc != null && tc.attemptNumber() == 0 &&
        tc.partitionId() == 1 &&
        slept.add((tc.stageId(), tc.partitionId(), tc.attemptNumber())))
        Thread.sleep(5000)
      id
    }
  }

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_taskretry_$name")
      .toString + "/t"

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[8, 4]") // maxFailures=4: task retries survive
        .appName("graft-taskretry")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.05")
        .config("spark.speculation.quantile", "0.2")
        // the 3.4+ efficiency gate suppresses speculation for tasks whose
        // data-processing rate looks fine — our bait task sleeps, so it
        // processes slowly but "efficiently"; disable the gate so the
        // duration-based trigger actually fires
        .config("spark.speculation.efficiency.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val failedTasks = new AtomicInteger(0)
    val speculativeTasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (!e.reason.toString.startsWith("Success")) failedTasks.incrementAndGet(): Unit
        if (e.taskInfo != null && e.taskInfo.speculative)
          speculativeTasks.incrementAndGet(): Unit
      }
    })

    val failU = udf((tag: String, id: Long) => Inject.guard(tag, id)).asNondeterministic()
    val slowU = udf((tag: String, id: Long) => Inject.slow(tag, id)).asNondeterministic()
    var failures = 0
    def check(name: String)(cond: Boolean, msg: => String): Unit =
      if (!cond) { failures += 1; println(s"FAIL [$name] $msg") }
      else println(s"ok   [$name] ${msg.takeWhile(_ != ':')}")

    // ---- scenario 1: appendViaStage under task retry + speculation ----
    locally {
      val dir = freshDir("append")
      val lake = LakeTable(spark, dir)
      lake.write(Seq((-1L, "seed")).toDF("id", "v").coalesce(1))
      val before = Inject.fired.get()
      Inject.mode = "append"
      val batch = spark.range(0, 4000).repartition(8)
        .select(slowU(lit("append"), failU(lit("append"), col("id"))).as("id"),
          lit("x").as("v"))
      lake.write(batch, SaveMode.Append)
      Inject.mode = ""
      val got = lake.read.where(col("id") >= 0)
      check("append")(Inject.fired.get() > before, "injected fault fired: yes")
      check("append")(got.count() == 4000L,
        s"exactly-once rows: got ${got.count()} of 4000")
      check("append")(got.select(countDistinct(col("id"))).head().getLong(0) == 4000L,
        s"no duplicated ids after retry/speculation")
      check("append")(
        lake.history.where(col("operation").contains("WRITE APPEND")).count() == 1L,
        "one commit for the retried append")
    }

    // ---- scenario 2: LakeSink batch under task retry ----
    locally {
      val dir = freshDir("sink")
      val lake = LakeTable(spark, dir)
      val before = Inject.fired.get()
      Inject.mode = "sink"
      val batch = spark.range(0, 2000).repartition(4)
        .select(failU(lit("sink"), col("id")).as("id"), lit("b").as("v"))
      LakeSink.writeBatch(lake, batch, 0L, "taskretry")
      // a redelivery of the SAME batch id must be skipped whole
      LakeSink.writeBatch(lake,
        spark.range(0, 2000).select(col("id"), lit("b").as("v")), 0L, "taskretry")
      Inject.mode = ""
      check("sink")(Inject.fired.get() > before, "injected fault fired: yes")
      check("sink")(lake.read.count() == 2000L,
        s"exactly-once batch: got ${lake.read.count()} of 2000")
      check("sink")(lake.maxCommitParamLong(LakeSink.TxnKeyPrefix + "taskretry") == 0L,
        "txn tag recorded once")
    }

    // ---- scenario 3: staged-swap upsert under task retry ----
    locally {
      val dir = freshDir("upsert")
      val lake = LakeTable(spark, dir)
      lake.write(spark.range(0, 1000).select(col("id"), lit("old").as("v")))
      val before = Inject.fired.get()
      Inject.mode = "upsert"
      val updates = spark.range(500, 1500).repartition(4)
        .select(failU(lit("upsert"), col("id")).as("id"), lit("new").as("v"))
      lake.upsert(updates, Seq("id"))
      Inject.mode = ""
      check("upsert")(Inject.fired.get() > before, "injected fault fired: yes")
      check("upsert")(lake.read.count() == 1500L,
        s"row count after merge: ${lake.read.count()} of 1500")
      check("upsert")(lake.read.where(col("v") === "new").count() == 1000L,
        "updated+inserted rows exactly once")
    }

    // ---- scenario 4: index-maintenance fold under task retry ----
    locally {
      val root = freshDir("fold")
      val base = LakeTable(spark, s"$root/docs").write(
        Seq((1L, "apple banana"), (2L, "banana cherry"), (3L, "cherry apple"))
          .toDF("doc_id", "text"))
      val dir = s"$root/idx"
      InvertedIndex.build(base, "doc_id", "text", dir)
      base.upsert(Seq((2L, "durian fig"), (4L, "grape apple"))
        .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true)
      val before = Inject.fired.get()
      Inject.mode = "fold"
      InvertedIndex.foldSourceDecoratorForTest = df =>
        df.withColumn("dl", failU(lit("fold"), col("dl").cast("long")).cast("int"))
      try InvertedIndex.applyChanges(base, "doc_id", "text", dir)
      finally {
        InvertedIndex.foldSourceDecoratorForTest = identity(_)
        Inject.mode = ""
      }
      check("fold")(Inject.fired.get() > before, "injected fault fired: yes")
      // folded index == rebuilt index, content-wise
      val rebuilt = s"$root/idx2"
      InvertedIndex.build(base, "doc_id", "text", rebuilt)
      def served(d: String) = InvertedIndex.serveBm25(spark, d,
        Seq(1L -> "apple", 2L -> "banana", 3L -> "durian", 4L -> "grape"),
        k = 10, InvertedIndex.DefaultK1, InvertedIndex.DefaultB)
        .collect().map(_.toString).sorted.toSeq
      check("fold")(served(dir) == served(rebuilt),
        "fold-under-retry equals rebuild")
    }

    val proven = failedTasks.get()
    check("listener")(proven >= 4,
      s"listener-counted failed task attempts: $proven (>=4 expected)")
    println(s"""{"probe":"taskretry","failed_task_attempts":$proven,""" +
      s""""speculative_attempts":${speculativeTasks.get()},""" +
      s""""injected_faults":${Inject.fired.get()},"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
