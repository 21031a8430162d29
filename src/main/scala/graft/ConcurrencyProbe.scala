package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable
import graft.streaming.LakeSink

/** Concurrent-writer probe (not part of the driver contract): a
  * streaming-sink APPEND loop and a COMPACTION loop genuinely racing on
  * one lake table over many commits — the contention pattern every
  * CDC-fed table lives under (ingest never pauses for maintenance). The
  * claims under test, measured rather than asserted:
  *   - zero lost updates: every appended batch survives with exactly its
  *     row count, however many compactions interleave;
  *   - maintenance REBASES over concurrent appends (occResolve) instead
  *     of failing or clobbering — rebase counts come from the commits'
  *     own `filesRebased` params;
  *   - when a writer does lose a race it fails LOUDLY and a plain retry
  *     converges — retries are counted, never silent.
  * Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.ConcurrencyProbe [nAppends] [nCompacts]
  */
object ConcurrencyProbe {

  def main(args: Array[String]): Unit = {
    val nAppends = args.headOption.map(_.toInt).getOrElse(40)
    val nCompacts = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val rowsPerBatch = 200
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_concprobe")
    val path = s"$base/t"
    val lake = LakeTable(spark, path).write(
      (0 until rowsPerBatch).map(i => (-1L, i.toLong, i * 1.0)).toDF("batch", "id", "v"))

    val appendRetries = new AtomicInteger
    val compactRetries = new AtomicInteger
    val compactApplied = new AtomicInteger
    val t0 = System.nanoTime()

    // writer A: the ingest loop — per-batch idempotent sink appends, the
    // exact shape LakeSink.streamTo drives; a batch that loses a race
    // with the swap retries under the SAME batch id (the sink's replay
    // contract makes the retry safe)
    val ingest = Future {
      (0 until nAppends).foreach { b =>
        val batch = (0 until rowsPerBatch)
          .map(i => (b.toLong, i.toLong, i * 1.0)).toDF("batch", "id", "v")
          .coalesce(1)
        var done = false
        while (!done) {
          try { LakeSink.writeBatch(lake, batch, b.toLong, "probe-app"); done = true }
          catch { case _: Throwable =>
            appendRetries.incrementAndGet(); Thread.sleep(25)
          }
        }
      }
    }
    // writer B: the maintenance loop — small-file compaction on a fixed
    // cadence, each run racing whatever batches land while it stages
    val maintenance = Future {
      (0 until nCompacts).foreach { _ =>
        Thread.sleep(120)
        try {
          LakeTable(spark, path).compactSmall(minFileBytes = 64L * 1024 * 1024)
          compactApplied.incrementAndGet(): Unit
        } catch { case e: Throwable =>
          compactRetries.incrementAndGet()
          System.err.println(s"[probe] compact failed: ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.next())
        }
      }
    }
    Await.result(ingest, 20.minutes)
    Await.result(maintenance, 20.minutes)
    val wall = (System.nanoTime() - t0) / 1e9

    // the exactness audit: every batch present with exactly its rows —
    // catches loss (swap dropped an append) AND duplication (a retry
    // re-appending a batch whose first attempt half-landed)
    val perBatch = lake.read.groupBy(col("batch")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ((-1L until nAppends.toLong)).map(_ -> rowsPerBatch.toLong).toMap
    val bad = (expected.keySet ++ perBatch.keySet).toSeq.sorted.flatMap { b =>
      (expected.get(b), perBatch.get(b)) match {
        case (Some(e), Some(g)) if e == g => None
        case (e, g) => Some(s"batch $b: expected ${e.getOrElse(0L)}, got ${g.getOrElse(0L)}")
      }
    }
    require(bad.isEmpty, s"LOST/DUPLICATED UPDATES:\n${bad.mkString("\n")}")

    // rebases the maintenance commits recorded (appends that landed
    // while a compaction staged and rode its manifest through)
    val rebased = lake.history
      .select(coalesce(col("operationParameters.filesRebased"), lit("0")).as("r"))
      .collect().map(_.getString(0).toInt).sum
    val files = lake.read.inputFiles.length

    println(
      s"""{"probe":"concurrency","n_appends":$nAppends,"n_compacts":$nCompacts,""" +
        s""""rows_per_batch":$rowsPerBatch,"lost_updates":0,""" +
        s""""append_retries":${appendRetries.get},"compact_retries":${compactRetries.get},""" +
        s""""compactions_applied":${compactApplied.get},"files_rebased":$rebased,""" +
        f""""final_files":$files,"wall_s":$wall%.1f}""")
    spark.stop()
  }
}
