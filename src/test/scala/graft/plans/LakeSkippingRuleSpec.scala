package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.LakeTable

class LakeSkippingRuleSpec extends SparkSpec {
  import spark.implicits._

  /** A statted lake with key-disjoint files: k in [0,1000), clustered so
    * each file covers a narrow key range.
    */
  private def statted(): LakeTable = {
    val root = Files.createTempDirectory("graft_skiprule").toString
    val lake = LakeTable(spark, s"$root/t")
    lake.write((0L until 1000L).map(k => (k, s"v$k")).toDF("k", "v"))
    lake.optimize(Seq("k"), numFiles = Some(8))
    lake.collectStats(Seq("k"))
    lake
  }

  private def locations(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location
      }
    }

  test("a filtered TVF read scans only the stats-admitted files") {
    val lake = statted()
    val df = spark.sql(
      s"SELECT * FROM graft_lake('${lake.path}') WHERE k = 7")
    val locs = locations(df)
    assert(locs.nonEmpty)
    val prunedLoc = locs.find(_.isInstanceOf[GraftPrunedFileIndex])
    assert(prunedLoc.isDefined, "rule did not fire on a statted lake scan")
    val total = lake.read.inputFiles.length
    assert(prunedLoc.get.inputFiles.length < total,
      s"expected < $total files after pruning")
    // correctness: identical to the unpruned read
    assert(df.collect().map(_.getString(1)).toSeq === Seq("v7"))
  }

  test("range predicates prune too, and results match the unpruned scan") {
    val lake = statted()
    val df = spark.read.parquet(lake.path).where(col("k") >= 900)
    assert(locations(df).exists(_.isInstanceOf[GraftPrunedFileIndex]))
    assert(df.count() === 100L)
    assert(df.agg(sum("k")).head.getLong(0) ===
      (900L until 1000L).sum)
  }

  test("no stats -> rule stays out of the plan") {
    val root = Files.createTempDirectory("graft_skiprule_ns").toString
    val lake = LakeTable(spark, s"$root/t")
    lake.write((0L until 100L).map(k => (k, k * 2)).toDF("k", "x"))
    val df = spark.read.parquet(lake.path).where(col("k") === 5)
    assert(!locations(df).exists(_.isInstanceOf[GraftPrunedFileIndex]))
    assert(df.count() === 1L)
  }

  test("files appended after collectStats are kept (no stats row -> no prune)") {
    val lake = statted()
    lake.write(Seq((5000L, "late")).toDF("k", "v"), SaveMode.Append)
    val df = spark.read.parquet(lake.path).where(col("k") === 5000L)
    // the late file has no stats row, so it survives pruning and the row
    // is found even though every STATTED file is pruned away
    assert(df.collect().map(_.getString(1)).toSeq === Seq("late"))
    assert(locations(df).exists(_.isInstanceOf[GraftPrunedFileIndex]))
  }

  test("a registered lake NAME prunes through the view") {
    val lake = statted()
    graft.sources.LakeNames.register(spark, "skipdb", "t", lake.path)
    try {
      val df = spark.sql("SELECT v FROM skipdb.t WHERE k = 321")
      assert(locations(df).exists(_.isInstanceOf[GraftPrunedFileIndex]))
      assert(df.collect().map(_.getString(0)).toSeq === Seq("v321"))
    } finally graft.sources.LakeNames.unregister(spark, "skipdb", "t")
  }

  test("an unprunable predicate leaves the plan unchanged") {
    val lake = statted()
    val df = spark.read.parquet(lake.path).where(col("v") === "v7") // v unstatted
    assert(!locations(df).exists(_.isInstanceOf[GraftPrunedFileIndex]))
    assert(df.count() === 1L)
  }
}
