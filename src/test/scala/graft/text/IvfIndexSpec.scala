package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.sources.LakeTable

class IvfIndexSpec extends SparkSpec {

  private def freshDir =
    Files.createTempDirectory("graft_ivfidx").resolve("idx").toString

  test("materialized serve matches the scan-and-assign IVF path") {
    val e = Tables(spark, sf0001).embeddings
    val dir = freshDir
    IvfIndex.build(e, "vec_id", "embedding", dir, nCells = 8, seed = 42L)
    val queries = e.where(col("vec_id") < 5)
    val served = IvfIndex
      .serveTopK(spark, dir, queries, "vec_id", "embedding", k = 3, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the reference path: same standing centers, corpus assigned per run
    val centers = Ivf.loadIndex(spark, new org.apache.hadoop.fs.Path(dir, "centers").toString)
    val direct = Ivf.ivfTopK(e, queries, "vec_id", "embedding", k = 3,
      nProbe = 3, centers = Some(centers))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served === direct, s"served $served != direct $direct")
  }

  test("a probe reads only the probed cells' files") {
    val e = Tables(spark, sf0001).embeddings
    val dir = freshDir
    IvfIndex.build(e, "vec_id", "embedding", dir, nCells = 8, seed = 42L)
    val q = IvfIndex.serveTopK(spark, dir,
      e.where(col("vec_id") === 0), "vec_id", "embedding", k = 3, nProbe = 2)
    q.collect()
    // readWhere hands the scan an EXPLICIT pruned file list, so the
    // scan's file-index size IS the post-skipping count (AQE hides the
    // scan nodes from plan.collect, so read it from the plan text)
    val plan = q.queryExecution.executedPlan.toString
    val filesRead = "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).max
    val total = LakeTable(spark,
      new org.apache.hadoop.fs.Path(dir, "postings").toString)
      .read.inputFiles.length
    assert(total >= 4, s"expected a multi-file postings layout, got $total")
    assert(filesRead < total,
      s"2-of-8-cell probe must skip postings files: read $filesRead of $total")
  }

  test("append assigns against the standing quantizer; new vectors retrieve") {
    val s = spark
    import s.implicits._
    val e = Tables(spark, sf0001).embeddings
    val dir = freshDir
    IvfIndex.build(e, "vec_id", "embedding", dir, nCells = 8, seed = 42L)
    // the new vector: a clone of vec 7 under a fresh id — it must land
    // in 7's cell and become 7's top-1 neighbor
    val clone = e.where(col("vec_id") === 7)
      .select(lit(900000L).as("vec_id"), col("embedding"))
    IvfIndex.append(clone, "vec_id", "embedding", dir)
    val top = IvfIndex.serveTopK(spark, dir,
      e.where(col("vec_id") === 7), "vec_id", "embedding", k = 1, nProbe = 2)
      .collect()
    assert(top.length === 1)
    assert(top.head.getLong(2) === 900000L,
      s"the appended clone must be vec 7's nearest neighbor: ${top.toSeq}")
    assert(top.head.getDouble(3) === 1.0)
  }
}
