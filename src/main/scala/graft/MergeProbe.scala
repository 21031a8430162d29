package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sources.LakeTable

/** Selective-MERGE scale probe (not part of the driver contract):
  * lineitem keyed by a synthetic unique id, clustered into 32 files with
  * min/max + bloom stats, then a 3-row point-upsert (2 updates + 1
  * insert) timed on (a) the stats-guided selective path — IN-list
  * pruning engages the blooms, only the files holding the keys rewrite —
  * and (b) an identical stats-less copy forced down the full staged
  * rewrite. This is the streaming-CDC hot path: at 100 TB the full
  * rewrite is O(table) per micro-batch, the selective path O(files
  * holding the batch's keys). Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.MergeProbe
  */
object MergeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_mergeprobe")

    // (l_orderkey, l_linenumber) is the TPC-H primary key — a dense,
    // deterministic unique id (monotonically_increasing_id would embed
    // partition bits, leaving chosen probe keys nonexistent)
    val li0 = Tables(spark, sfDir).lineitem
      .withColumn("uid", col("l_orderkey") * 10 + col("l_linenumber"))
    val li =
      if (rep <= 1) li0.localCheckpoint(true)
      else li0.crossJoin(spark.range(rep).select(col("id").as("__r")))
        .withColumn("uid", col("uid") * rep + col("__r")).drop("__r")
        .localCheckpoint(true)
    val n = li.count()

    def mkTable(name: String, withStats: Boolean): LakeTable = {
      val t = LakeTable(spark, s"$base/$name").write(li)
        .optimize(Seq("uid"), numFiles = Some(32))
      if (withStats) t.collectStats(Seq("uid"), bloomFor = Seq("uid")) else t
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // 2 updates on real mid-table keys + 1 brand-new key
    val midUid = li.select(percentile_approx(col("uid"), lit(0.5), lit(100)))
      .collect().head.getLong(0)
    val updates = li.where(col("uid") >= midUid).orderBy("uid").limit(2)
      .withColumn("l_returnflag", lit("U"))
    val batch = updates
      .unionByName(li.limit(1).withColumn("uid", lit(-1L)))
      .localCheckpoint(true)

    val sel = mkTable("sel", withStats = true)
    val full = mkTable("full", withStats = false)

    val selSec = timed { sel.upsert(batch, Seq("uid")): Unit }
    val fullSec = timed { full.upsert(batch, Seq("uid")): Unit }

    def mergeParams(t: LakeTable) =
      t.history.where(col("operation") === "MERGE")
        .select("operationParameters.filesRewritten", "operationParameters.selective")
        .collect().headOption
        .map(r => (Option(r.getString(0)).getOrElse("all"), Option(r.getString(1)).getOrElse("false")))
        .getOrElse(("?", "?"))
    val (selFiles, selFlag) = mergeParams(sel)

    // correctness cross-check: both paths converge to identical tables
    val a = sel.read.agg(count(lit(1)), sum(crc32(concat_ws("",
      col("uid"), col("l_returnflag"))))).collect().head
    val b = full.read.agg(count(lit(1)), sum(crc32(concat_ws("",
      col("uid"), col("l_returnflag"))))).collect().head
    val same = a == b

    println(
      s"""{"probe":"merge","rows":$n,"selectiveSec":${f"$selSec%.2f"},""" +
        s""""fullSec":${f"$fullSec%.2f"},"selFilesRewritten":"$selFiles",""" +
        s""""selective":"$selFlag","identical":$same}""")
    spark.stop()
  }
}
