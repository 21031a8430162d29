package graft.text

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana"),
    (3L, "cherry apple"),
    (4L, "durian durian apple banana cherry durian")
  ).toDF("doc_id", "text")

  private def freshDir =
    Files.createTempDirectory("graft_invidx").resolve("idx").toString

  test("standing-index serve equals the direct BM25 computation") {
    val dir = freshDir
    InvertedIndex.build(docs, "doc_id", "text", dir)
    val queries = Seq((10L, "apple"), (10L, "banana"), (20L, "durian"))
      .toDF("query_id", "term")
    val served = InvertedIndex.serveBm25(spark, dir, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // the reference path: score the corpus directly and fold per query
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val direct = TfIdf.bm25(docs, "doc_id", "text")
      .join(queries, Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("bm25")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(served === direct, s"served $served != direct $direct")
    // durian appears only in doc 4 — its rarity must rank doc 4 first
    assert(served.exists(t => t._1 == 20L && t._2 == 1L && t._3 == 4L))
  }

  test("serving reads only the index lakes, never the corpus") {
    val dir = freshDir
    InvertedIndex.build(docs, "doc_id", "text", dir)
    val plan = InvertedIndex
      .serveBm25(spark, dir, Seq((1L, "apple")).toDF("query_id", "term"), k = 2)
      .queryExecution.executedPlan.toString
    // every file scan in the serve plan points under the index directory
    val scanned = "file:[^\\]\\s,]*".r.findAllIn(plan).toSeq
    assert(scanned.nonEmpty)
    val idx = new java.io.File(dir).getCanonicalPath
    scanned.foreach { p =>
      assert(p.contains(idx), s"serve plan scans outside the index: $p\n$plan")
    }
  }
}
