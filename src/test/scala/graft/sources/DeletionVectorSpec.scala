package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Merge-on-read DELETE via deletion vectors (LakeTable.deleteVectored):
  * position-delete semantics must be invisible to every read path, and
  * the commit gate must make a half-finished delete invisible too.
  */
class DeletionVectorSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_dvtest").resolve("t").toString

  private def priceSum(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)

  test("vectored delete matches copy-on-write delete row for row") {
    val o = Tables(spark, sf0001).orders
    val cond = col("o_orderstatus") === "F" && col("o_totalprice") > 150000
    val cow = LakeTable(spark, tmp()).write(o)
    cow.delete(cond)
    val mor = LakeTable(spark, tmp()).write(o)
    mor.deleteVectored(cond)
    assert(mor.hasDeletionVectors)
    assert(mor.read.count() === cow.read.count())
    assert(priceSum(mor.read) === priceSum(cow.read))
    // physical files untouched: the raw row count still includes deleted rows
    assert(spark.read.parquet(mor.path).count() === o.count())
  }

  test("overlapping second delete excludes already-deleted rows from its vector and feed") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    lake.deleteVectored(col("o_totalprice") > 200000, changeFeed = true)
    val afterFirst = lake.read.count()
    // overlaps: every >200000 row also matches >100000
    lake.deleteVectored(col("o_totalprice") > 100000, changeFeed = true)
    val expected = o.where(!(col("o_totalprice") > 100000)).count()
    assert(lake.read.count() === expected)
    // the second feed must contain only the NEWLY deleted rows
    val feed = lake.readChanges()
    val perVersion = feed.groupBy("_commit_version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val firstN = o.where(col("o_totalprice") > 200000).count()
    val secondN = o.where(
      col("o_totalprice") > 100000 && !(col("o_totalprice") > 200000)).count()
    assert(perVersion.values.toSeq.sorted === Seq(firstN, secondN).sorted)
    assert(feed.count() === afterFirst - expected + firstN)
  }

  test("readWhere (stats skipping) applies deletion vectors") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp())
    lake.write(o.repartition(4))
    lake.collectStats(Seq("o_totalprice"))
    lake.deleteVectored(col("o_totalprice") > 200000)
    assert(lake.readWhere(col("o_totalprice") > 150000).count() ===
      o.where(col("o_totalprice") > 150000 && !(col("o_totalprice") > 200000)).count())
  }

  test("selective copy-on-write rewrite keeps vectors on untouched files") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp())
    // cluster by custkey so a selective predicate prunes to a file subset
    lake.write(o)
    lake.optimize(Seq("o_custkey"), numFiles = Some(4))
    lake.collectStats(Seq("o_custkey"))
    lake.deleteVectored(col("o_totalprice") > 200000)
    val afterDv = lake.read.count()
    // COW update on a key range: rewrites SOME files, keeps the rest —
    // the kept files' vectors must survive, the rewritten files must
    // have materialized theirs
    val lo = o.agg(min("o_custkey")).head.getLong(0)
    lake.update(Map("o_orderpriority" -> lit("9-TEST")), col("o_custkey") === lo)
    val hist = lake.history.where(col("operation") === "UPDATE")
      .select("operationParameters.filesKept").collect()
    assert(hist.nonEmpty && hist.head.getString(0).toInt > 0,
      "expected a selective rewrite (filesKept > 0)")
    assert(lake.read.count() === afterDv)
    assert(lake.read.where(col("o_totalprice") > 200000).count() === 0)
  }

  test("compact materializes vectors and drops them") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    lake.deleteVectored(col("o_totalprice") > 200000)
    val before = lake.read.count()
    lake.compact()
    assert(!lake.hasDeletionVectors)
    assert(new java.io.File(lake.path, LakeTable.DvDirName).exists() === false)
    assert(lake.read.count() === before)
    assert(spark.read.parquet(lake.path).count() === before,
      "compaction must physically drop deleted rows")
  }

  test("an unclaimed vector dir is invisible and vacuumDebris removes it") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    val total = lake.read.count()
    // simulate a crash between the DV write and its commit: a vector dir
    // exists but no commit claims it
    val phantom = new Path(lake.path, LakeTable.DvDirName + "/d0123456789abcdef")
    o.limit(5)
      .select(
        lit("/nonexistent").as(LakeTable.DvFileCol),
        monotonically_increasing_id().as(LakeTable.DvRowCol))
      .write.parquet(phantom.toString)
    assert(lake.read.count() === total, "unclaimed vectors must not apply")
    lake.vacuumDebris()
    val fs = phantom.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(phantom))
  }

  test("vacuumDebris keeps claimed vector dirs") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    lake.deleteVectored(col("o_totalprice") > 200000)
    val after = lake.read.count()
    lake.vacuumDebris()
    assert(lake.hasDeletionVectors)
    assert(lake.read.count() === after)
  }

  test("SQL DELETE routes to deletion vectors under the merge-on-read conf") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    spark.conf.set(graft.plans.LakeSqlDml.DeleteModeKey, "merge-on-read")
    try spark.sql(s"DELETE FROM graft_lake('${lake.path}') WHERE o_totalprice > 200000")
    finally spark.conf.unset(graft.plans.LakeSqlDml.DeleteModeKey)
    assert(lake.hasDeletionVectors)
    assert(lake.read.count() === o.where(!(col("o_totalprice") > 200000)).count())
    // physical files untouched — proves the route was merge-on-read
    assert(spark.read.parquet(lake.path).count() === o.count())
  }

  test("vectored deletes work on a partitioned layout (where COW can't be selective)") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp())
    lake.writePartitioned(o, Seq("o_orderstatus"))
    lake.deleteVectored(col("o_totalprice") > 200000)
    assert(lake.read.count() === o.where(!(col("o_totalprice") > 200000)).count())
    // partition pruning still composes with the DV anti-join
    assert(lake.read.where(col("o_orderstatus") === "F").count() ===
      o.where(col("o_orderstatus") === "F" && !(col("o_totalprice") > 200000)).count())
    // dynamic overwrite of ONE partition: its files are replaced (their
    // vectors become harmless orphans); other partitions keep theirs
    lake.overwritePartitions(
      o.where(col("o_orderstatus") === "O"), Seq("o_orderstatus"))
    assert(lake.read.where(col("o_orderstatus") === "O").count() ===
      o.where(col("o_orderstatus") === "O").count(),
      "rewritten partition is fully restored (vectors orphaned)")
    assert(lake.read.where(col("o_orderstatus") === "F").count() ===
      o.where(col("o_orderstatus") === "F" && !(col("o_totalprice") > 200000)).count(),
      "untouched partitions keep their vectors")
  }

  test("concurrent vectored deletes both apply (each claims its own dir)") {
    val o = Tables(spark, sf0001).orders
    val path = tmp()
    LakeTable(spark, path).write(o)
    // two writers, two INDEPENDENT LakeTable handles, overlapping
    // predicates — unlike COW rewrites (last-swap-wins), MOR deletes
    // only ADD claimed vectors, and the anti-join unions them
    val t1 = new Thread(() =>
      LakeTable(spark, path).deleteVectored(col("o_totalprice") > 200000))
    val t2 = new Thread(() =>
      LakeTable(spark, path).deleteVectored(
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000))
    t1.start(); t2.start(); t1.join(); t2.join()
    val lake = LakeTable(spark, path)
    val expected = o.where(!(col("o_totalprice") > 200000 ||
      (col("o_orderstatus") === "F" && col("o_totalprice") > 150000))).count()
    assert(lake.read.count() === expected)
    assert(lake.history.where(col("operation") === "DELETE").count() === 2)
  }

  test("streaming read applies vectors live at stream start") {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp()).write(o)
    lake.deleteVectored(col("o_totalprice") > 200000)
    val expected = lake.read.count()
    val out = Files.createTempDirectory("graft_dvstream").toString
    val q = lake.readStream.writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$out/data").count() === expected)
  }
}
