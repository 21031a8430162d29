package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental stats maintenance (LakeTable.refreshStats): appended
  * files gain stats by scanning ONLY themselves, orphaned rows from
  * selective rewrites are dropped, and the refreshed table prunes
  * exactly like a from-scratch collection.
  */
class StatsRefreshSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_statsrefresh").resolve("t").toString

  test("refresh stats appended files only, pruning works on them") {
    val o = Tables(spark, sf0001).orders
    val lo = o.where(col("o_totalprice") <= 150000)
    val hi = o.where(col("o_totalprice") > 150000)
    val lake = LakeTable(spark, tmp())
    lake.write(lo.repartition(2))
    lake.collectStats(Seq("o_totalprice"))
    val statted = spark.read.parquet(lake.path + "/" + LakeTable.StatsDirName).count()
    assert(statted === 2)
    lake.write(hi.repartition(3), SaveMode.Append)
    // unstatted appended files are never pruned — correct but unskipped
    assert(lake.prunedFiles(col("o_totalprice") > 900000).size >= 3)
    lake.refreshStats()
    val after = spark.read.parquet(lake.path + "/" + LakeTable.StatsDirName).count()
    assert(after === 5)
    // the refresh commit proves only the 3 new files were scanned
    val params = lake.history
      .where(col("operationParameters.incremental") === "true")
      .select("operationParameters.filesScanned").collect()
    assert(params.map(_.getString(0)) === Array("3"))
    // and pruning + results now engage on the appended range
    assert(lake.readWhere(col("o_totalprice") > 150000).count() === hi.count())
    assert(lake.prunedFiles(col("o_totalprice") <= 150000).size <= 2)
  }

  test("refresh reuses the last bloom spec and keeps bloom pruning live") {
    val o = Tables(spark, sf0001).orders
    val keys = o.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val split = keys(keys.length / 2)
    val lake = LakeTable(spark, tmp())
    lake.write(o.where(col("o_orderkey") < split).repartition(4))
    lake.collectStats(Seq("o_orderkey"), bloomFor = Seq("o_orderkey"))
    lake.write(o.where(col("o_orderkey") >= split).repartition(4), SaveMode.Append)
    lake.refreshStats()
    val stats = spark.read.parquet(lake.path + "/" + LakeTable.StatsDirName)
    assert(stats.count() === 8)
    assert(stats.where(col(FileStats.bloomCol("o_orderkey")).isNull).count() === 0,
      "refreshed rows must carry blooms per the recorded spec")
    // a point lookup in the APPENDED half bloom-prunes (round-robin
    // layout defeats bounds; the key lives in ~1 file)
    val probe = keys(keys.length / 2 + keys.length / 4)
    assert(lake.prunedFiles(col("o_orderkey") === probe).size < 8)
    assert(lake.readWhere(col("o_orderkey") === probe).count() === 1)
  }

  test("refresh drops orphaned rows after a selective rewrite") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp())
    lake.write(o)
    lake.optimize(Seq("o_custkey"), numFiles = Some(4))
    lake.collectStats(Seq("o_custkey"))
    val lo = o.agg(min("o_custkey")).head.getLong(0)
    // selective COW delete rewrites the file(s) holding lo, orphaning
    // their stats rows; replacement files are unstatted
    lake.delete(col("o_custkey") === lo)
    lake.refreshStats()
    val stats = spark.read.parquet(lake.path + "/" + LakeTable.StatsDirName)
    val liveFiles = new java.io.File(lake.path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(stats.count() === liveFiles,
      "every live file statted, no orphans")
    val refreshes = lake.history
      .where(col("operationParameters.incremental") === "true").count()
    assert(refreshes === 1)
    // second refresh is a no-op: nothing new, no orphans -> no commit
    lake.refreshStats()
    assert(lake.history
      .where(col("operationParameters.incremental") === "true").count() === 1)
  }

  test("refresh without a prior collectStats fails loudly") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    val e = intercept[IllegalArgumentException] { lake.refreshStats() }
    assert(e.getMessage.contains("collectStats"))
  }

  test("a crashed stats-refresh stage is not data and vacuumDebris sweeps it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_statstage").resolve("t").toString
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    lake.collectStats(Seq("id"))
    // simulate a refresh crash: a stats stage full of parquet left inside
    // the table dir — it must never surface as table data
    val stage = s"$dir/_graft_stats__staging"
    spark.read.parquet(s"$dir/_graft_stats").write.parquet(stage)
    assert(lake.read.count() === 2,
      "stats-stage parquet must not read as phantom table rows")
    assert(lake.prunedFiles(col("id") === 1L)
      .forall(!_.contains("_graft_stats__staging")))
    lake.vacuumDebris()
    val f = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(stage)),
      "vacuumDebris must sweep the crashed stats stage")
  }
}
