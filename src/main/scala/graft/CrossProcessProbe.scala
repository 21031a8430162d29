package graft

import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{GraftSession, Tables}
import graft.sources.LakeTable
import graft.text.{InvertedIndex, IvfIndex}

/** Cross-PROCESS concurrency probe (not part of the driver contract).
  *
  * Every prior concurrency result (ConcurrencyProbe, CdcRaceProbe,
  * ServeConcurrencyProbe) shares one JVM, where in-process locks can
  * mask protocol holes. This probe forks REAL child JVMs (`java -cp`,
  * separate SparkSessions, no shared memory) and exercises the two
  * multi-process topologies the engine's own scale story claims:
  *
  *   A. COMMIT-CLAIM RACES — two writer processes append to one lake
  *      table concurrently. Exactly-once requires the version claim
  *      (LakeIo.renamePublish) to be atomic ACROSS processes: on local
  *      fs that is the hard-link claim (link(2) EEXIST refuse at the
  *      kernel); before that upgrade the local branch was in-JVM-only
  *      and this phase lost commit records. Audit: every row exactly
  *      once, every commit record present, versions contiguous.
  *
  *   B. STAGED-SWAP RACES — one process appends while TWO processes
  *      (parent + forked child) run compactions. The stage slot is one
  *      physical `__staging` dir, so concurrent rewrites are arbitrated
  *      by the atomic stage claim (LakeTable.claimStage): losers get a
  *      clean ConcurrentModificationException and retry — counted here,
  *      never corruption. Audit: exact rows, no stage/claim debris.
  *
  *   C. READ-REPLICA SERVING — the engine's serving scale-out answer
  *      ("more read-only replica sessions over the same index dirs")
  *      demonstrated for real: replica JVMs mount the standing BM25 +
  *      IVF index directories and serve SQL TVF lookups while THIS
  *      process's maintenance streams fold live change-feed deltas.
  *      Freshness (STALE refusal + retry) and torn-scan retries must
  *      behave identically cross-process; a sentinel doc inserted and
  *      folded at the end must be VISIBLE to every replica. Throughput
  *      with two replicas must beat one replica — scale-out measured,
  *      not asserted (the single-driver 8-thread ceiling measured by
  *      ServeConcurrencyProbe motivates replicas in the first place).
  *      A final pipeline phase spans THREE processes: a forked child
  *      PRODUCES change-feed deltas, this process FOLDS them, and a
  *      forked replica SERVES — ending with a sentinel visibility gate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.CrossProcessProbe
  */
object CrossProcessProbe {

  /** Fork a child JVM running `mainClass` with this JVM's classpath and
    * module flags (the --add-opens set Spark needs on JDK 17+), stdout+
    * stderr to `logFile`.
    */
  private[graft] def forkJvm(
      mainClass: String, args: Seq[String], logFile: String,
      heapMb: Int = 4096): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val moduleFlags = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("--enable-native-access") || a.startsWith("-Dio.netty"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      s"-Xmx${heapMb}m", "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
    new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(logFile))
      .start()
  }

  private def await(p: Process, what: String, timeoutSec: Long = 900): Unit = {
    require(p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS),
      s"$what did not finish within ${timeoutSec}s")
    require(p.exitValue() == 0, s"$what exited ${p.exitValue()} — see its log")
  }

  private def readJson(path: String): Map[String, String] = {
    // flat {"k":v,...} with string or numeric values — the only shape
    // the child mains write
    val s = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    """"([^"]+)":("[^"]*"|[-0-9.Ee+]+|true|false)""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\""))
      .toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = Files.createTempDirectory("graft_xproc").toString
    val writerMain = "graft.CrossProcessWriterMain"
    val replicaMain = "graft.CrossProcessReplicaMain"

    // ---------------- phase A: two-process commit-claim races ----------------
    val tableA = s"$root/tableA"
    LakeTable(spark, tableA).write(
      Seq((-1L, -1, -1)).toDF("id", "writer", "batch"))
    val aBatches = 25; val aRows = 200
    val aT0 = System.nanoTime()
    val wa = forkJvm(writerMain,
      Seq(tableA, "1", aBatches.toString, aRows.toString, "append", "0",
        s"$root/wa.json"), s"$root/wa.log")
    val wb = forkJvm(writerMain,
      Seq(tableA, "2", aBatches.toString, aRows.toString, "append", "0",
        s"$root/wb.json"), s"$root/wb.log")
    await(wa, "phase A writer 1"); await(wb, "phase A writer 2")
    val aWall = (System.nanoTime() - aT0) / 1e9
    val la = LakeTable(spark, tableA)
    val aExpected = 1L + 2L * aBatches * aRows
    val aCount = la.read.count()
    val aDistinct = la.read.select("id").distinct().count()
    val hist = la.history.select("version", "operation")
      .as[(Long, String)].collect().sortBy(_._1)
    val aAppends = hist.count(_._2 == "WRITE APPEND")
    val aVersionsContiguous = hist.map(_._1).toSeq == (0L until hist.length).toSeq
    require(aCount == aExpected && aDistinct == aExpected,
      s"phase A lost/duplicated rows: count=$aCount distinct=$aDistinct expected=$aExpected")
    require(aAppends == 2 * aBatches,
      s"phase A lost commit records: $aAppends append commits, expected ${2 * aBatches}")
    require(aVersionsContiguous,
      s"phase A version sequence has holes: ${hist.map(_._1).mkString(",")}")

    // ---------------- phase B: swap races (appender + two compactors) ----------------
    val tableB = s"$root/tableB"
    LakeTable(spark, tableB).write(
      Seq((-1L, -1, -1)).toDF("id", "writer", "batch"))
    val bBatches = 30; val bRows = 200
    val bT0 = System.nanoTime()
    val appender = forkJvm(writerMain,
      Seq(tableB, "3", bBatches.toString, bRows.toString, "append", "120",
        s"$root/bapp.json"), s"$root/bapp.log")
    val compactor = forkJvm(writerMain,
      Seq(tableB, "4", "12", "0", "compact", "150",
        s"$root/bcomp.json"), s"$root/bcomp.log")
    // the parent is the SECOND compactor — a third process in the race
    var parentRefusals = 0
    var parentCompacts = 0
    val lb = LakeTable(spark, tableB)
    while (appender.isAlive || compactor.isAlive) {
      try {
        lb.compactSmall(minFileBytes = 1L << 30, targetFileBytes = 1L << 30): Unit
        parentCompacts += 1
      } catch {
        case _: java.util.ConcurrentModificationException => parentRefusals += 1
        case e: Exception if LakeTable.isTornRead(e) => parentRefusals += 1
      }
      Thread.sleep(200)
    }
    await(appender, "phase B appender"); await(compactor, "phase B compactor")
    val bWall = (System.nanoTime() - bT0) / 1e9
    val bExpected = 1L + bBatches.toLong * bRows
    val bCount = lb.read.count()
    val bDistinct = lb.read.select("id").distinct().count()
    require(bCount == bExpected && bDistinct == bExpected,
      s"phase B lost/duplicated rows: count=$bCount distinct=$bDistinct expected=$bExpected")
    val childRefusals = readJson(s"$root/bcomp.json")("cme_refusals").toInt
    val fsB = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file://$tableB"), spark.sparkContext.hadoopConfiguration)
    require(!fsB.exists(new org.apache.hadoop.fs.Path(s"$tableB${LakeTable.StageSuffix}")),
      "phase B left a stage behind")
    require(!fsB.exists(new org.apache.hadoop.fs.Path(s"$tableB${LakeTable.StageClaimSuffix}")),
      "phase B left a stage claim behind")

    // ---------------- phase B2: two-process upsert contention ----------------
    // both writers STAGE every batch (upsert = staged merge), so the
    // stage claim arbitrates constantly; disjoint key ranges make the
    // exactness audit sharp — every row exactly once, no cross-stage
    // corruption, and at least one clean refusal actually observed
    val tableB2 = s"$root/tableB2"
    LakeTable(spark, tableB2).write(
      Seq((-1L, -1, -1)).toDF("id", "writer", "batch"))
    val b2Batches = 12; val b2Rows = 50
    val u1 = forkJvm(writerMain,
      Seq(tableB2, "6", b2Batches.toString, b2Rows.toString, "upsert", "0",
        s"$root/u1.json"), s"$root/u1.log")
    val u2 = forkJvm(writerMain,
      Seq(tableB2, "7", b2Batches.toString, b2Rows.toString, "upsert", "0",
        s"$root/u2.json"), s"$root/u2.log")
    await(u1, "phase B2 upserter 1"); await(u2, "phase B2 upserter 2")
    val lb2 = LakeTable(spark, tableB2)
    val b2Expected = 1L + 2L * b2Batches * b2Rows
    require(lb2.read.count() == b2Expected &&
      lb2.read.select("id").distinct().count() == b2Expected,
      s"phase B2 lost/duplicated rows: ${lb2.read.count()} vs $b2Expected")
    val b2Refusals = readJson(s"$root/u1.json")("cme_refusals").toInt +
      readJson(s"$root/u2.json")("cme_refusals").toInt

    // ---------------- phase D: fresh-JVM catalog attach ----------------
    // a new process's in-memory catalog is empty; LakeNames.register is
    // the documented stateless attach — the child asserts cold-resolution
    // FAILS, attaches, and runs named DML whose effect we verify here
    val tableD = s"$root/tableD"
    LakeTable(spark, tableD).write(
      Seq((-1L, -1, -1), (7L, 7, 7)).toDF("id", "writer", "batch"))
    val namesChild = forkJvm(writerMain,
      Seq(tableD, "5", "1", "0", "names", "0", s"$root/names.json"),
      s"$root/names.log")
    await(namesChild, "phase D names child")
    require(LakeTable(spark, tableD).read.count() == 1L,
      "phase D: the child's named DELETE did not reach the table")

    // ---------------- phase C: read-replica serving ----------------
    val docs = LakeTable(spark, s"$root/docs").write(
      Tables(spark, sfDir).documents.select("doc_id", "text"))
    val vecs = LakeTable(spark, s"$root/vecs").write(
      Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding")))
    val bmDir = s"$root/bm25"; val ivfDir = s"$root/ivf"
    InvertedIndex.build(docs, "doc_id", "text", bmDir)
    IvfIndex.build(vecs, "vec_id", "embedding", ivfDir, nCells = 16,
      seed = 7L, sampleFraction = 1.0)
    // seed the change feeds, then keep the indexes under live maintenance
    docs.upsert(Seq((899999L, "seed doc")).toDF("doc_id", "text"),
      Seq("doc_id"), changeFeed = true)
    vecs.upsert(
      vecs.read.limit(1).select(lit(899999L).as("vec_id"), col("embedding")),
      Seq("vec_id"), changeFeed = true)
    val m1 = InvertedIndex.startMaintenanceStream(docs, "doc_id", "text",
      bmDir, Trigger.ProcessingTime(200L))
    val m2 = IvfIndex.startMaintenanceStream(vecs, "vec_id", "embedding",
      ivfDir, Trigger.ProcessingTime(200L))

    val sentinelTerm = "zqxgraftsentinel"
    def churn(n: Int, idBase: Long): Unit = (0 until n).foreach { i =>
      docs.upsert(Seq((idBase + i, s"fresh cross process doc $i"))
        .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true)
      Thread.sleep(400)
    }
    // the sentinel upsert can race a churn child's stage claim — retry
    // the documented refusal like any lake client
    def foldAndFlag(flag: String, docId: Long): Unit = {
      var done = false
      while (!done) {
        try {
          docs.upsert(Seq((docId, s"$sentinelTerm payload"))
            .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true): Unit
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => Thread.sleep(100)
          case e: Exception if LakeTable.isTornRead(e) => Thread.sleep(100)
        }
      }
      m1.processAllAvailable(); m2.processAllAvailable()
      Files.write(Paths.get(flag), s"$sentinelTerm $docId".getBytes(StandardCharsets.UTF_8)): Unit
    }
    val serves = 24

    // C1: one replica process; the parent churns the feed
    val r1 = forkJvm(replicaMain,
      Seq(root, serves.toString, s"$root/flag1", s"$root/r1.json", "1"),
      s"$root/r1.log")
    churn(6, 910000L)
    foldAndFlag(s"$root/flag1", 920001L)
    await(r1, "replica 1 (solo)")
    val j1 = readJson(s"$root/r1.json")
    require(j1("sentinel_ok") == "true", "solo replica missed the folded sentinel")

    // C2: two replica processes concurrently (same parent-churn regime
    // as C1, so the qps compare isolates PROCESS scale-out from
    // freshness lag)
    val r2a = forkJvm(replicaMain,
      Seq(root, serves.toString, s"$root/flag2", s"$root/r2a.json", "2"),
      s"$root/r2a.log")
    val r2b = forkJvm(replicaMain,
      Seq(root, serves.toString, s"$root/flag2", s"$root/r2b.json", "3"),
      s"$root/r2b.log")
    churn(6, 930000L)
    foldAndFlag(s"$root/flag2", 940001L)
    await(r2a, "replica 2a"); await(r2b, "replica 2b")
    val j2a = readJson(s"$root/r2a.json"); val j2b = readJson(s"$root/r2b.json")
    require(j2a("sentinel_ok") == "true" && j2b("sentinel_ok") == "true",
      "a concurrent replica missed the folded sentinel")
    // C3: the full CDC pipeline across THREE processes — a forked child
    // PRODUCES change-feed deltas, this process's maintenance streams
    // FOLD them, and a forked replica SERVES freshness-gated lookups;
    // ends with a sentinel fold the replica must see
    val r3 = forkJvm(replicaMain,
      Seq(root, serves.toString, s"$root/flag3", s"$root/r3.json", "4"),
      s"$root/r3.log")
    val churner = forkJvm(writerMain,
      Seq(s"$root/docs", "9", "6", "0", "cdcchurn", "400", s"$root/churn.json"),
      s"$root/churn.log")
    await(churner, "phase C3 cdc churn child")
    foldAndFlag(s"$root/flag3", 950001L)
    await(r3, "phase C3 replica")
    val j3 = readJson(s"$root/r3.json")
    require(j3("sentinel_ok") == "true",
      "phase C3 replica missed the sentinel folded from a third process's feed")
    require(docs.read.where(col("doc_id") >= 9000000L && col("doc_id") < 9000006L)
      .count() == 6L, "phase C3: the churn child's CDC upserts did not all land")
    require(m1.exception.isEmpty && m2.exception.isEmpty,
      s"maintenance stream died under replica serving: ${m1.exception.orElse(m2.exception)}")
    m1.stop(); m2.stop()

    val qps1 = j1("qps").toDouble
    // combined throughput: total serves over the slower child's wall —
    // the honest aggregate (both children ran the whole window)
    val wall2 = math.max(j2a("wall_s").toDouble, j2b("wall_s").toDouble)
    val qps2 = 2.0 * serves / wall2
    val stales = Seq(j1, j2a, j2b, j3).map(_("stale_retries").toInt).sum
    require(qps2 > qps1 * 1.1,
      f"replica scale-out did not materialize: solo $qps1%.2f qps vs 2-replica $qps2%.2f qps")

    println(
      s"""{"probe":"cross_process",""" +
        f""""phaseA_rows":$aCount,"phaseA_commits":${hist.length},"phaseA_wall_s":$aWall%.1f,""" +
        f""""phaseB_rows":$bCount,"phaseB_wall_s":$bWall%.1f,""" +
        s""""phaseB_parent_compacts":$parentCompacts,"phaseB_parent_refusals":$parentRefusals,""" +
        s""""phaseB_child_compacts":${readJson(s"$root/bcomp.json")("compacts").toInt},""" +
        s""""phaseB_child_refusals":$childRefusals,""" +
        s""""phaseB2_rows":${lb2.read.count()},"phaseB2_claim_refusals":$b2Refusals,""" +
        f""""solo_qps":$qps1%.2f,"two_replica_qps":$qps2%.2f,""" +
        f""""scaleout_x":${qps2 / qps1}%.2f,"stale_retries":$stales,""" +
        f""""c3_pipeline_qps":${j3("qps").toDouble}%.2f,""" +
        s""""sentinel_ok":true,"stream_deaths":0}""")
    spark.stop()
  }
}

/** Child writer: appends unique-id batches or runs compactions against
  * one shared lake table, retrying the documented
  * ConcurrentModificationException refusals. Args:
  * table writerId nBatches rowsPerBatch mode sleepMs outFile
  */
object CrossProcessWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(table, writerIdS, nBatchesS, rowsS, mode, sleepS, outFile) = args
    val writerId = writerIdS.toInt
    val nBatches = nBatchesS.toInt; val rows = rowsS.toInt
    val sleepMs = sleepS.toLong
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val lake = LakeTable(spark, table)
    var refusals = 0; var compacts = 0
    (0 until nBatches).foreach { b =>
      mode match {
        case "append" =>
          val base = writerId * 10000000L + b.toLong * rows
          lake.write((0 until rows).map(i => (base + i, writerId, b))
            .toDF("id", "writer", "batch"), SaveMode.Append): Unit
        case "names" =>
          // fresh-JVM catalog attach contract (LakeNames scaladoc): the
          // in-memory catalog starts EMPTY in a new process, register()
          // is the stateless attach, and full named DML works after it
          val resolvedCold =
            try { spark.sql("SELECT count(*) FROM xproc.t").collect(); true }
            catch { case _: org.apache.spark.sql.AnalysisException => false }
          require(!resolvedCold,
            "fresh-JVM catalog unexpectedly resolved a lake name it never registered")
          graft.sources.LakeNames.register(spark, "xproc", "t", table)
          val n0 = spark.sql("SELECT count(*) FROM xproc.t").collect()(0).getLong(0)
          spark.sql("DELETE FROM xproc.t WHERE id = -1"): Unit
          val n1 = spark.sql("SELECT count(*) FROM xproc.t").collect()(0).getLong(0)
          require(n1 == n0 - 1,
            s"named DML after attach: expected ${n0 - 1} rows, got $n1")
        case "upsert" =>
          // stage-claim contention at its hardest: EVERY batch stages a
          // rewrite, so two upserting processes collide on the claim
          // constantly — the loser must get the clean CME and converge
          // on retry, never corrupt the other's stage
          val base = writerId * 10000000L + b.toLong * rows
          val batch = (0 until rows).map(i => (base + i, writerId, b))
            .toDF("id", "writer", "batch")
          var done = false; var tries = 0
          // generous cap: the peer HOLDS the claim for its whole staged
          // rewrite (~1s), so a fair interleaving burns many short
          // retries per peer batch
          while (!done && tries < 600) {
            try {
              lake.upsert(batch, Seq("id")): Unit
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                refusals += 1; tries += 1; Thread.sleep(100)
              case e: Exception if LakeTable.isTornRead(e) =>
                refusals += 1; tries += 1; Thread.sleep(100)
            }
          }
          require(done, s"upserter starved after $tries refusals")
        case "cdcchurn" =>
          // cross-process CDC PRODUCTION: upsert change-feed deltas into a
          // docs-schema table another process's maintenance streams fold
          // live. Upserts stage, so they arbitrate the stage claim with
          // any concurrent writer (e.g. the parent's sentinel) — retry
          // the documented refusal like any lake client
          val base = writerId * 1000000L
          var done = false; var tries = 0
          while (!done && tries < 50) {
            try {
              lake.upsert(
                Seq((base + b, s"fresh cross process doc $b"))
                  .toDF("doc_id", "text"),
                Seq("doc_id"), changeFeed = true): Unit
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                refusals += 1; tries += 1; Thread.sleep(100)
              case e: Exception if LakeTable.isTornRead(e) =>
                refusals += 1; tries += 1; Thread.sleep(100)
            }
          }
          require(done, s"cdcchurn starved after $tries refusals")
        case "compact" =>
          var done = false; var tries = 0
          while (!done && tries < 50) {
            try {
              lake.compactSmall(minFileBytes = 1L << 30,
                targetFileBytes = 1L << 30): Unit
              compacts += 1; done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                refusals += 1; tries += 1; Thread.sleep(100)
              case e: Exception if LakeTable.isTornRead(e) =>
                refusals += 1; tries += 1; Thread.sleep(100)
            }
          }
          require(done, s"compactor starved after $tries refusals")
      }
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    Files.write(Paths.get(outFile),
      s"""{"writer":$writerId,"cme_refusals":$refusals,"compacts":$compacts}"""
        .getBytes(StandardCharsets.UTF_8)): Unit
    spark.stop()
  }
}

/** Child read replica: mounts the standing BM25 + IVF index dirs built
  * by another process and serves SQL TVF lookups with the standard
  * STALE-retry + torn-read-retry client loop; once the parent's flag
  * file appears (sentinel folded), runs the sentinel lookup and
  * requires the doc to be visible. Args: root serves flagFile outFile id
  */
object CrossProcessReplicaMain {
  def main(args: Array[String]): Unit = {
    val Array(root, servesS, flagFile, outFile, idS) = args
    val serves = servesS.toInt; val childId = idS.toInt
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // pool loads are lake reads racing the primary's maintenance swaps —
    // the same torn-scan family every lake client absorbs with a retry
    val termPool = LakeTable.retryTornRead(s"replica $childId terms")(
      LakeTable(spark, s"$root/bm25/terms").read
        .orderBy(col("df").desc, col("term")).limit(64)
        .select("term").as[String].collect())
    val vecPool = LakeTable.retryTornRead(s"replica $childId vecs")(
      LakeTable(spark, s"$root/vecs").read
        .orderBy("vec_id").limit(32).select("embedding")
        .as[Array[Float]].collect())
    var staleRetries = 0
    def serveSql(sql: String): Array[org.apache.spark.sql.Row] = {
      var out: Array[org.apache.spark.sql.Row] = null
      while (out == null) {
        try out = LakeTable.retryTornRead(s"replica $childId")(
          spark.sql(sql).collect())
        catch {
          case e: IllegalStateException if e.getMessage.contains("STALE") =>
            staleRetries += 1; Thread.sleep(100)
        }
      }
      out
    }
    def serve(i: Int): Unit = {
      val k = childId * 31 + i
      val sql =
        if (i % 2 == 0) {
          val q = Seq(termPool(k % termPool.length),
            termPool((k * 7 + 3) % termPool.length)).mkString(" ")
          s"SELECT * FROM graft_bm25_topk('$root/bm25', '$q', 10)"
        } else {
          val lit = vecPool(k % vecPool.length)
            .map(f => s"${f}F").mkString("array(", ", ", ")")
          s"SELECT * FROM graft_ann_topk('$root/ivf', $lit, 10)"
        }
      require(serveSql(sql).nonEmpty, s"replica $childId: empty serve $i")
    }
    serve(0) // warm-up (codegen + session init), excluded from timing
    val t0 = System.nanoTime()
    (1 to serves).foreach(serve)
    val wall = (System.nanoTime() - t0) / 1e9
    // wait for the parent's sentinel flag, then require visibility
    val deadline = System.currentTimeMillis() + 180000L
    while (!Files.exists(Paths.get(flagFile)) &&
      System.currentTimeMillis() < deadline) Thread.sleep(200)
    require(Files.exists(Paths.get(flagFile)), s"replica $childId: no flag in 180s")
    val Array(term, docIdS) =
      new String(Files.readAllBytes(Paths.get(flagFile)), StandardCharsets.UTF_8)
        .trim.split(" ")
    val hit = serveSql(s"SELECT * FROM graft_bm25_topk('$root/bm25', '$term', 10)")
      .exists(_.getAs[Long]("doc_id") == docIdS.toLong)
    Files.write(Paths.get(outFile),
      (s"""{"child":$childId,"serves":$serves,""" +
        f""""wall_s":$wall%.2f,"qps":${serves / wall}%.3f,""" +
        s""""stale_retries":$staleRetries,"sentinel_ok":$hit}""")
        .getBytes(StandardCharsets.UTF_8)): Unit
    spark.stop()
    require(hit, s"replica $childId: sentinel doc not visible after fold")
  }
}
