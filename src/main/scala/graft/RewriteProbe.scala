package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sources.LakeTable

/** Selective-rewrite scale probe (not part of the driver contract):
  * lineitem clustered on l_orderkey into 32 files, stats collected, then
  * a DELETE of a narrow orderkey band timed on (a) the stats-guided
  * selective path — only the files whose min/max admit the band rewrite —
  * and (b) an identical stats-less copy forced down the full staged
  * rewrite. Also reports how many files each path rewrote. Results
  * recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.RewriteProbe
  */
object RewriteProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_rwprobe")

    // rep > 1 scales the table with key-shifted copies so the
    // fixed-cost-vs-data-cost crossover is measurable locally
    val li0 = Tables(spark, sfDir).lineitem
    val shift = li0.agg(max("l_orderkey")).collect().head.getLong(0) + 1
    val li =
      if (rep <= 1) li0
      else li0
        .crossJoin(spark.range(rep).select(col("id").as("__r")))
        .withColumn("l_orderkey", col("l_orderkey") + col("__r") * shift)
        .drop("__r")
    val (lo, hi) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // a ~1/32 band in the middle: with 32 range-clustered files this
    // touches 1-2 files
    val bandLo = lo + (hi - lo) / 2
    val bandHi = bandLo + (hi - lo) / 32

    def mkTable(name: String, withStats: Boolean): LakeTable = {
      val t = LakeTable(spark, s"$base/$name").write(li)
        .optimize(Seq("l_orderkey"), numFiles = Some(32))
      if (withStats) t.collectStats(Seq("l_orderkey")) else t
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val sel = mkTable("sel", withStats = true)
    val full = mkTable("full", withStats = false)
    val cond = col("l_orderkey") >= bandLo && col("l_orderkey") < bandHi

    val selSec = timed { sel.delete(cond): Unit }
    val fullSec = timed { full.delete(cond): Unit }

    val sc = sel.read.count()
    val fc = full.read.count()
    require(sc == fc, s"selective ($sc) and full ($fc) deletes disagree")
    def params(t: LakeTable) = t.history
      .where(col("operation") === "DELETE").select("operationParameters")
      .collect().headOption.map(_.toString).getOrElse("{}")
    println(
      f"""{"metric":"selective_rewrite_probe","rep":$rep,"rows_after":$sc,""" +
        f""""selective_sec":$selSec%.2f,"full_sec":$fullSec%.2f,""" +
        f""""selective_params":"${params(sel).replace("\"", "'")}"}""")
    spark.stop()
  }
}
