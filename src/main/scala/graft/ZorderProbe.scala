package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sources.LakeTable

/** Multi-dimension Z-order probe (not part of the driver contract):
  * measures parquet row-group/file skipping for per-dimension band
  * predicates under (a) linear lexicographic clustering and (b) Morton
  * interleave, at 2 and 3 clustered columns.
  *
  * The question this answers for 100 TB layout choices: linear
  * clustering prunes only on the LEADING column — filters on later
  * columns scan everything — while Morton tiling spends per-dimension
  * resolution to prune on EVERY clustered column. The 3-column run
  * quantifies how much per-dimension pruning weakens as bits/dim shrink
  * (63/3 -> 16 bits is still ample; the real dilution is tile count per
  * dim). Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ZorderProbe
  */
object ZorderProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .localCheckpoint(true)
    val total = li.count()

    // band predicates: ~1% selectivity per dimension at any SF. The
    // clustered columns are integral — the literals MUST be longs, or the
    // comparison casts the column to double and parquet pushdown (the
    // thing being measured) silently dies.
    def band(c: String) = {
      val Array(a, b) = li.stat.approxQuantile(c, Array(0.40, 0.41), 0.001)
      val lo = a.toLong
      val hi = math.max(b.toLong, lo + 1)
      col(c) >= lo && col(c) < hi
    }

    def scannedRows(lake: LakeTable, pred: org.apache.spark.sql.Column): Long = {
      val q = lake.read.where(pred)
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }

    val two = Seq("l_partkey", "l_suppkey")
    val three = Seq("l_partkey", "l_suppkey", "l_quantity")
    // quantiles of the (checkpointed) probe frame never change between
    // layouts — compute each column's band once, not once per run
    val bands = (two ++ three).distinct.map(c => c -> band(c)).toMap

    def run(label: String, cols: Seq[String], curve: String): Unit = {
      val path = Files.createTempDirectory("graft_zprobe").resolve("t").toString
      val lake = LakeTable(spark, path).write(li)
      curve match {
        case "morton"  => lake.optimizeZorder(cols, numFiles = Some(32))
        case "hilbert" => lake.optimizeHilbert(cols, numFiles = Some(32))
        case "linear"  => lake.optimize(cols, numFiles = Some(32))
        case other     => sys.error(s"unknown curve: $other")
      }
      val perDim = cols.map(c => f""""$c":${scannedRows(lake, bands(c))}""")
      println(s"""{"probe":"$label","cols":${cols.length},"total":$total,${perDim.mkString(",")}}""")
    }

    run("linear_2d", two, "linear")
    run("morton_2d", two, "morton")
    run("hilbert_2d", two, "hilbert")
    run("linear_3d", three, "linear")
    run("morton_3d", three, "morton")
    run("hilbert_3d", three, "hilbert")
    spark.stop()
  }
}
