package graft

import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{GraftSession, Tables}
import graft.sources.LakeTable
import graft.text.{InvertedIndex, IvfIndex}

/** Concurrent-serving throughput probe (not part of the driver
  * contract): every bench number is a sequential single query, but a
  * production cluster serves MANY point lookups at once against the
  * standing indexes — while the maintenance stream folds base deltas in
  * the background. This measures the "single writer per index, many
  * readers" contract instead of asserting it, in THREE regimes that
  * decompose the cost: the same 96-serve SQL TVF workload
  * (`graft_bm25_topk` + `graft_ann_topk`) runs (1) sequentially — the
  * per-driver serving capacity unit; (2) 8-way concurrent against QUIET
  * indexes — isolates driver/scheduler contention from freshness; and
  * (3) 8-way concurrent while a writer commits change-feed deltas that
  * live maintenance streams fold — a serve that catches the index
  * mid-fold sees the documented STALE refusal (freshness guard),
  * retries, and must converge; retries are counted, stream deaths are
  * zero, p50/p95/throughput recorded per regime in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ServeConcurrencyProbe [servesPerThread]
  */
object ServeConcurrencyProbe {

  private val Threads = 8

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val perThread = args.headOption.map(_.toInt).getOrElse(12)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_serveprobe").toString

    val docs = LakeTable(spark, s"$root/docs").write(
      Tables(spark, sfDir).documents.select("doc_id", "text"))
    val vecs = LakeTable(spark, s"$root/vecs").write(
      Tables(spark, sfDir).embeddings.select(
        col("vec_id"), col("embedding")))
    val bmDir = s"$root/bm25"
    val ivfDir = s"$root/ivf"
    InvertedIndex.build(docs, "doc_id", "text", bmDir)
    IvfIndex.build(vecs, "vec_id", "embedding", ivfDir, nCells = 16,
      seed = 7L, sampleFraction = 1.0)

    // deterministic workloads drawn from the corpus itself: high-df
    // terms for BM25 (every serve finds real postings), real corpus
    // vectors for ANN (every serve probes populated cells)
    val termPool = LakeTable(spark, s"$bmDir/terms").read
      .orderBy(col("df").desc, col("term")).limit(64)
      .select("term").as[String].collect()
    val vecPool = vecs.read.orderBy("vec_id").limit(32)
      .select("embedding").as[Array[Float]].collect()
    def bm25Sql(i: Int) = {
      val q = Seq(termPool(i % termPool.length),
        termPool((i * 7 + 3) % termPool.length)).mkString(" ")
      s"SELECT * FROM graft_bm25_topk('$root/bm25', '$q', 10)"
    }
    def annSql(i: Int) = {
      val lit = vecPool(i % vecPool.length)
        .map(f => s"${f}F").mkString("array(", ", ", ")")
      s"SELECT * FROM graft_ann_topk('$root/ivf', $lit, 10)"
    }
    def sqlFor(i: Int) = if (i % 2 == 0) bm25Sql(i / 2) else annSql(i / 2)

    val staleRetries = new AtomicInteger
    def serve(i: Int): Double = {
      val t0 = System.nanoTime()
      var done = false
      while (!done) {
        try {
          // torn scans under the maintenance stream's postings rewrites
          // are the same retryable family every CDC consumer handles
          LakeTable.retryTornRead(s"serve $i")(spark.sql(sqlFor(i)).collect())
          done = true
        } catch {
          case e: IllegalStateException if e.getMessage.contains("STALE") =>
            // the freshness guard working as designed: a base commit
            // landed and the maintenance stream hasn't folded it yet
            staleRetries.incrementAndGet()
            Thread.sleep(100)
        }
      }
      (System.nanoTime() - t0) / 1e9
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }

    val total = Threads * perThread
    // warm-up: JIT + codegen caches, excluded from both measurements
    (0 until 4).foreach(serve)

    // ---- sequential baseline: same workload, one serve at a time ----
    val sT0 = System.nanoTime()
    val seqLat = (0 until total).map(serve)
    val seqWall = (System.nanoTime() - sT0) / 1e9

    // ---- concurrent QUIET phase: 8 threads, no writer, no streams ----
    // separates scheduler/driver-planning contention from freshness lag
    val qPool = Executors.newFixedThreadPool(Threads)
    val qEc = ExecutionContext.fromExecutor(qPool)
    val qT0 = System.nanoTime()
    val quietLat = (0 until Threads).map { t =>
      Future { (0 until perThread).map(j => serve(t * perThread + j)) }(qEc)
    }.flatMap(Await.result(_, 30.minutes))
    val quietWall = (System.nanoTime() - qT0) / 1e9
    qPool.shutdown()

    // ---- concurrent phase: 8 threads + live maintenance streams ----
    // seed each feed (the change-feed streaming source precondition)
    docs.upsert(Seq((99999L, s"${termPool.head} seed doc"))
      .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true)
    vecs.upsert(Seq((99999L, vecPool.head)).toDF("vec_id", "embedding"),
      Seq("vec_id"), changeFeed = true)
    val q1 = InvertedIndex.startMaintenanceStream(docs, "doc_id", "text",
      bmDir, Trigger.ProcessingTime(200L))
    val q2 = IvfIndex.startMaintenanceStream(vecs, "vec_id", "embedding",
      ivfDir, Trigger.ProcessingTime(200L))
    val pool = Executors.newFixedThreadPool(Threads + 1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // BOUNDED delta count, not run-until-serving-done: the freshness
    // guard is strict (a serve refuses while ANY commit is unfolded), so
    // an unbounded writer could starve the fresh windows indefinitely —
    // 8 delta pairs overlap most of the serving window and then let the
    // streams drain, so the tail serves measure the recovered regime
    val nDeltas = 8
    val deltasApplied = new AtomicInteger
    val writer = Future {
      (0 until nDeltas).foreach { i =>
        docs.upsert(Seq((100000L + i,
          s"${termPool(i % termPool.length)} fresh doc $i"))
          .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true)
        vecs.upsert(Seq((100000L + i, vecPool(i % vecPool.length)))
          .toDF("vec_id", "embedding"), Seq("vec_id"), changeFeed = true)
        deltasApplied.incrementAndGet()
        Thread.sleep(400)
      }
    }
    val cT0 = System.nanoTime()
    val futures = (0 until Threads).map { t =>
      Future { (0 until perThread).map(j => serve(t * perThread + j)) }
    }
    val concLat = futures.flatMap(Await.result(_, 30.minutes))
    val concWall = (System.nanoTime() - cT0) / 1e9
    Await.result(writer, 5.minutes)
    q1.processAllAvailable(); q2.processAllAvailable()
    require(q1.exception.isEmpty && q2.exception.isEmpty,
      s"maintenance stream died under serving load: ${q1.exception.orElse(q2.exception)}")
    q1.stop(); q2.stop(); pool.shutdown()

    println(
      s"""{"probe":"serve_concurrency","threads":$Threads,"serves":$total,""" +
        f""""seq_p50_s":${pct(seqLat, 0.5)}%.3f,"seq_p95_s":${pct(seqLat, 0.95)}%.3f,""" +
        f""""seq_wall_s":$seqWall%.1f,"seq_qps":${total / seqWall}%.2f,""" +
        f""""quiet_p50_s":${pct(quietLat, 0.5)}%.3f,"quiet_p95_s":${pct(quietLat, 0.95)}%.3f,""" +
        f""""quiet_wall_s":$quietWall%.1f,"quiet_qps":${total / quietWall}%.2f,""" +
        f""""conc_p50_s":${pct(concLat, 0.5)}%.3f,"conc_p95_s":${pct(concLat, 0.95)}%.3f,""" +
        f""""conc_wall_s":$concWall%.1f,"conc_qps":${total / concWall}%.2f,""" +
        s""""deltas_during_concurrent":${deltasApplied.get},""" +
        s""""stale_retries":${staleRetries.get},"stream_deaths":0}""")
    spark.stop()
  }
}
