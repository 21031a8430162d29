package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table cloning (Delta CREATE TABLE … CLONE): shallow clones are
  * zero-copy manifest views pinned at clone time; deep clones are full
  * independent copies; rewriting a shallow clone detaches it through
  * the normal staged-swap path.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshSrc(): (String, LakeTable) = {
    val root = Files.createTempDirectory("graft_clone").toString
    val lake = LakeTable(spark, s"$root/src")
      .write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "x"))
    (root, lake)
  }

  private def dataFileCount(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists) 0
    else d.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  test("shallow clone is zero-copy, pinned at clone time, append-friendly") {
    val (root, src) = freshSrc()
    val clone = src.cloneTo(s"$root/c1")
    assert(clone.isShallowClone)
    // zero data files copied — the clone dir holds only metadata
    assert(dataFileCount(s"$root/c1") === 0)
    assert(clone.read.orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // source APPENDS after the clone never leak in (pinned file set).
    // Source REWRITES are the documented hazard (they delete files the
    // clone still references) — materialize the clone before rewriting
    // its source, same contract as Delta shallow clone + VACUUM.
    src.write(Seq((4L, 40.0)).toDF("id", "x"), SaveMode.Append)
    assert(clone.read.count() === 3)
    assert(clone.read.where(col("id") === 4L).count() === 0)
    // appends to the CLONE stay zero-copy: local files read alongside
    // the manifest
    clone.write(Seq((5L, 50.0)).toDF("id", "x"), SaveMode.Append)
    assert(clone.isShallowClone)
    assert(clone.read.count() === 4)
    assert(clone.read.where(col("id") === 5L).count() === 1)
    // history starts fresh: one CLONE commit plus the local append
    val ops = clone.history.select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("CLONE"))
    assert(clone.history.count() === 2)
  }

  test("rewriting a shallow clone detaches it; the source is untouched") {
    val (root, src) = freshSrc()
    val clone = src.cloneTo(s"$root/c2")
    clone.delete(col("id") === 2L)
    assert(!clone.isShallowClone)
    assert(clone.read.orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (3L, 30.0)))
    // the source still owns its files and content
    assert(src.read.count() === 3)
    // the detached clone is now fully independent: stats work again
    clone.collectStats(Seq("id"))
    assert(clone.readWhere(col("id") === 3L).count() === 1)
  }

  test("materialize detaches explicitly and bakes in local appends") {
    val (root, src) = freshSrc()
    val clone = src.cloneTo(s"$root/c3")
    clone.write(Seq((9L, 90.0)).toDF("id", "x"), SaveMode.Append)
    clone.materialize()
    assert(!clone.isShallowClone)
    assert(clone.read.count() === 4)
    assert(dataFileCount(s"$root/c3") > 0)
    // idempotent no-op afterwards
    clone.materialize()
    assert(clone.read.count() === 4)
    val ops = clone.history.select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "MATERIALIZE") === 1)
  }

  test("deep clone is independent immediately and carries constraints") {
    val (root, src) = freshSrc()
    src.addConstraint("pos", "x > 0")
    val clone = src.cloneTo(s"$root/c4", shallow = false)
    assert(!clone.isShallowClone)
    assert(dataFileCount(s"$root/c4") > 0)
    src.update(Map("x" -> lit(77.0)), col("id") === 3L)
    assert(clone.read.where(col("id") === 3L).select("x").head.getDouble(0) === 30.0)
    // the source's constraint gates the clone's writes too
    intercept[IllegalArgumentException] {
      clone.write(Seq((8L, -1.0)).toDF("id", "x"), SaveMode.Append)
    }
  }

  test("clone of a shallow clone flattens to the original files") {
    val (root, src) = freshSrc()
    val c1 = src.cloneTo(s"$root/c5")
    val c2 = c1.cloneTo(s"$root/c6")
    assert(c2.isShallowClone)
    assert(c2.read.count() === 3)
    // detaching the MIDDLE clone must not break the second-level clone
    c1.materialize()
    assert(c2.read.count() === 3)
  }

  test("shallow-clone guards: streaming, stats and file pruning refuse") {
    val (root, src) = freshSrc()
    val clone = src.cloneTo(s"$root/c7")
    intercept[IllegalArgumentException] { clone.readStream: Unit }
    intercept[IllegalArgumentException] { clone.collectStats(Seq("id")): Unit }
    intercept[IllegalArgumentException] { clone.prunedFiles(col("id") === 1L): Unit }
    // readWhere stays usable — correct, just unpruned
    assert(clone.readWhere(col("id") === 2L).count() === 1)
    // a non-empty destination refuses
    intercept[IllegalArgumentException] { src.cloneTo(s"$root/c7"): Unit }
  }

  test("shallow clone refuses layouts it cannot pin") {
    val root = Files.createTempDirectory("graft_clone_refuse").toString
    val part = LakeTable(spark, s"$root/part").writePartitioned(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "day", "x"), Seq("day"))
    intercept[IllegalArgumentException] { part.cloneTo(s"$root/pc"): Unit }
    // deep clone of a partitioned table preserves the layout
    val deep = part.cloneTo(s"$root/pd", shallow = false)
    assert(deep.partitionColumns() === Seq("day"))
    assert(deep.read.count() === 2)
    val dv = LakeTable(spark, s"$root/dv")
      .write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x"))
    dv.deleteVectored(col("id") === 1L)
    intercept[IllegalArgumentException] { dv.cloneTo(s"$root/dvc"): Unit }
  }

  test("SQL: CREATE TABLE … SHALLOW CLONE registers a queryable name") {
    val root = Files.createTempDirectory("graft_clone_sql").toString
    val src = LakeTable(spark, s"$root/src")
      .write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x"))
    val quoted = s"$root/src".replace("'", "''")
    spark.sql(
      s"CREATE TABLE default.clone_sql_t SHALLOW CLONE graft_lake('$quoted') " +
        s"LOCATION '$root/dest'")
    try {
      assert(LakeTable(spark, s"$root/dest").isShallowClone)
      assert(spark.sql("SELECT count(*) FROM default.clone_sql_t").head.getLong(0) === 2L)
      // named DML routes to the clone and detaches it
      spark.sql("DELETE FROM default.clone_sql_t WHERE id = 1")
      assert(spark.sql("SELECT count(*) FROM default.clone_sql_t").head.getLong(0) === 1L)
      assert(!LakeTable(spark, s"$root/dest").isShallowClone)
      assert(src.read.count() === 2) // source untouched
      // LOCATION is mandatory for the path-backed lake
      val e = intercept[IllegalArgumentException] {
        spark.sql(s"CREATE TABLE default.clone_sql_t2 DEEP CLONE graft_lake('$quoted')")
      }
      assert(e.getMessage.contains("LOCATION"))
    } finally {
      // registered lake names are views over the graft_lake TVF
      spark.sql("DROP VIEW IF EXISTS default.clone_sql_t")
      spark.sql("DROP VIEW IF EXISTS default.clone_sql_t2")
    }
  }

  test("CREATE OR REPLACE CLONE validates the source before touching the destination") {
    val root = Files.createTempDirectory("graft_clone_replace").toString
    LakeTable(spark, s"$root/dest")
      .write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x"))
    spark.sql(s"CREATE TABLE default.clone_keep_t USING graft_lake LOCATION '$root/dest'")
    try {
      // a typo'd source path must fail the statement with the replace
      // target's data INTACT — not delete first and fail after
      intercept[IllegalArgumentException] {
        spark.sql(
          s"CREATE OR REPLACE TABLE default.clone_keep_t " +
            s"SHALLOW CLONE graft_lake('$root/no_such_table') LOCATION '$root/dest'")
      }
      assert(LakeTable(spark, s"$root/dest").read.count() === 2)
    } finally {
      spark.sql("DROP VIEW IF EXISTS default.clone_keep_t")
    }
  }
}
