package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.sources.LakeTable

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incremental probe finds planted near-dups of indexed docs") {
    val base = "the quick brown fox jumps over the lazy dog near the river " +
      "bank while morning mist settles across quiet water and tall reeds " +
      "sway gently under a pale early sky before the ferry arrives"
    val corpus = Seq(
      (1L, base),
      (2L, "completely different content about sparks and data lakes at scale"),
      (3L, "a third document with its own unrelated words and phrases here")
    ).toDF("id", "text")
    // batch doc 10 is doc 1 with ONE word changed (high jaccard, so the
    // banded probe finds it with near-certainty); 11 is novel
    val batch = Seq(
      (10L, base.replace("lazy dog", "lazy cat")),
      (11L, "entirely novel text that matches nothing in the standing corpus")
    ).toDF("id", "text")
    val index = Dedup.buildMinhashIndex(corpus, "id", "text", n = 3)
    val hits = Dedup.incrementalNearDup(batch, index, "id", "text",
      n = 3, threshold = 0.5).collect()
    assert(hits.exists(r => r.getLong(0) == 10L && r.getLong(1) == 1L),
      s"planted near-dup missed: ${hits.mkString(",")}")
    assert(!hits.exists(_.getLong(0) == 11L), "novel doc matched something")
  }

  test("signature-agreement estimate tracks exact jaccard on real near-dups") {
    val docs = Tables(spark, sf0001).documents
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val index = Dedup.buildMinhashIndex(corpus, "doc_id", "text", n = 3,
      bands = 8, rowsPerBand = 4)
    val est = Dedup.incrementalNearDup(batch, index, "doc_id", "text",
      n = 3, threshold = 0.5, bands = 8, rowsPerBand = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // ground truth: exact cross-half jaccard >= 0.8 pairs must all be found
    // (32-hash estimate is coarse, so probe at a lower threshold and check
    // recall of the confidently-duplicate pairs)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }
    assert(exact.nonEmpty, "fixture lost its planted cross-half near-dups")
    val found = exact.count(est.contains)
    assert(found.toDouble / exact.size >= 0.9,
      s"recall ${found.toDouble / exact.size} on ${exact.size} true pairs")
  }

  test("verified incremental path EQUALS the exact cross-half jaccard set") {
    // the declared query's contract (q_incremental_neardup is fully
    // oracled): index-probe candidates + exact verify must reproduce
    // brute-force cross-half jaccard >= 0.7 exactly at the 16x2 banding
    val docs = Tables(spark, sf001).documents
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val index = Dedup.buildMinhashIndex(corpus, "doc_id", "text", n = 3,
      bands = 16, rowsPerBand = 2)
    val verified = Dedup.incrementalNearDupVerified(
      batch, index, corpus, "doc_id", "text", n = 3, threshold = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .filter { case ((a, b), _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case ((a, b), j) => (if (a % 2 == 1) (a, b) else (b, a)) -> j }
      .toMap
    assert(exact.nonEmpty, "fixture lost its planted cross-half near-dups")
    assert(verified === exact,
      s"verified path must equal brute force: got ${verified.size}, want ${exact.size}")
  }

  test("index round-trips through a lake table and probes identically") {
    val docs = Tables(spark, sf0001).documents
    val corpus = docs.where(col("doc_id") < 100)
    val batch = docs.where(col("doc_id") >= 100 && col("doc_id") < 150)
    val index = Dedup.buildMinhashIndex(corpus, "doc_id", "text", n = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString
    LakeTable(spark, s"$dir/idx").write(index)
    val loaded = LakeTable(spark, s"$dir/idx").read
    def probe(idx: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNearDup(batch, idx, "doc_id", "text", n = 3,
        threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probe(loaded) === probe(index))
  }
}
