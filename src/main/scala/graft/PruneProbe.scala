package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable

/** High-file-count prune probe (not part of the driver contract): a
  * synthetic table of `files` small range-clustered files with stats,
  * then a narrow band predicate pruned (a) the driver-map way — one
  * collected verdict row PER FILE — and (b) the relational way — the
  * file list joined against the stats table, only SURVIVING paths
  * collected. Reports survivors, rows the driver had to materialize on
  * each path, and timings; results recorded in BASELINE.md.
  *
  * The point at 100 TB: a table with millions of files and a selective
  * predicate must not ship millions of verdict rows to the driver.
  * Both paths must agree file-for-file.
  *
  * Usage: runMain graft.PruneProbe [numFiles]
  */
object PruneProbe {

  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_pruneprobe")

    // `files` single-row-group files, each holding a disjoint k-range
    val rowsPerFile = 500L
    val df = spark.range(files * rowsPerFile).select(col("id").as("k"))
    val lake = LakeTable(spark, s"$base/t").write(df)
    lake.optimize(Seq("k"), numFiles = Some(files))
    lake.collectStats(Seq("k"))

    // a band covering ~4 files' worth of keys
    val cond = col("k") >= 0L && col("k") < 4 * rowsPerFile
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }

    spark.conf.set(LakeTable.PruneDriverThresholdKey, Int.MaxValue.toString)
    val (driverFiles, driverSec) = timed(lake.prunedFiles(cond))
    spark.conf.set(LakeTable.PruneDriverThresholdKey, "0")
    val (joinFiles, joinSec) = timed(lake.prunedFiles(cond))

    require(driverFiles.toSet == joinFiles.toSet,
      s"strategies disagree: ${driverFiles.size} vs ${joinFiles.size}")
    val survivors = joinFiles.size
    // driver-materialized verdict/path rows per strategy: the map path
    // collects one row per statted file; the join path collects one row
    // per SURVIVOR
    println(
      f"""{"metric":"prune_probe","files":$files,"survivors":$survivors,""" +
        f""""driver_rows_map":$files,"driver_rows_join":$survivors,""" +
        f""""driver_sec":$driverSec%.2f,"join_sec":$joinSec%.2f}""")
    spark.stop()
  }
}
