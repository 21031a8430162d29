package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps the smallest id per duplicate text") {
    val df = Seq(
      (1L, "hello world"), (5L, "hello world"), (3L, "hello world"),
      (2L, "unique text")
    ).toDF("id", "text")
    val out = Dedup.exact(df, "text", "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("exact dedup is idempotent") {
    val docs = Tables(spark, sf0001).documents
    val once = Dedup.exact(docs, "text", "doc_id")
    val twice = Dedup.exact(once, "text", "doc_id")
    assert(once.count() === twice.count())
  }

  test("MLlib minhash candidates include every high-jaccard exact pair (recall=1 on planted dups)") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
  }

  test("native banded minhash finds every high-jaccard pair with exact jaccard values") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact.nonEmpty)
    val banded = Dedup.minhashBandedPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    exact.foreach { case (pair, j) =>
      assert(banded.contains(pair), s"missed planted pair $pair")
      assert(math.abs(banded(pair) - j) < 1e-6, s"jaccard mismatch for $pair")
    }
    // verification step keeps false positives out
    banded.values.foreach(j => assert(j >= 0.7))
  }

  test("simhash near-dup pairs overlap the planted high-jaccard pairs") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash(hamming<=3) is a coarser filter; it should still catch most
    // >=0.9-jaccard pairs
    val caught = exact.intersect(sh).size.toDouble
    assert(exact.isEmpty || caught / exact.size >= 0.5,
      s"simhash caught $caught of ${exact.size}")
  }

  test("ngram jaccard matches a brute-force check on a small sample") {
    val docs = Tables(spark, sf0001).documents.where(col("doc_id") < 50)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String) =
      t.trim.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    for {
      (a, ta) <- local; (b, tb) <- local if a < b
      sa = shingleSet(ta); sb = shingleSet(tb)
      inter = sa.intersect(sb).size if inter > 0
    } {
      val expected = inter.toDouble / (sa.size + sb.size - inter)
      val got = pairs.getOrElse((a, b), 0.0)
      assert(math.abs(got - expected) < 1e-4, s"pair ($a,$b): $got vs $expected")
    }
  }

  test("embedding near-dup LSH finds only pairs above threshold, sorted") {
    val e = Tables(spark, sf0001).embeddings
    val out = Dedup.embeddingNearDup(e, "vec_id", "embedding", 64, 0.4).collect()
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.4)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
