package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse computes exact reciprocal-rank sums and ranks them") {
    // q=1: doc 10 is rank 1 lexically and rank 2 semantically;
    // doc 20 is rank 2 lexically only; doc 30 is rank 1 semantically only.
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("q_id", "doc_id", "lex_rank")
    val sem = Seq((1L, 30L, 1L), (1L, 10L, 2L)).toDF("q_id", "doc_id", "sem_rank")
    val out = HybridSearch.rrfFuse(Seq(lex, sem), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def rrf(ranks: Long*): Double =
      BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10 in both lists dominates each single-list doc
    assert(out.toSeq === Seq(
      (1L, 1L, 10L, rrf(1, 2)),
      (1L, 2L, 30L, rrf(1)),
      (1L, 3L, 20L, rrf(2))))
  }

  test("rrf ties break deterministically by doc id") {
    val lex = Seq((1L, 7L, 1L), (1L, 3L, 2L)).toDF("q_id", "doc_id", "lex_rank")
    val sem = Seq((1L, 9L, 1L), (1L, 5L, 2L)).toDF("q_id", "doc_id", "sem_rank")
    // 7 and 9 tie at 1/61; 3 and 5 tie at 1/62 — ids order within each tie
    val out = HybridSearch.rrfFuse(Seq(lex, sem), k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 7L), (2L, 9L), (3L, 3L), (4L, 5L)))
  }

  test("hybrid query returns well-formed per-query top-5 at sf0.001") {
    val out = HybridSearch.qHybridRrf(spark, sf0001)
    assert(out.columns.toSeq === Seq("q_id", "rank", "doc_id", "rrf"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { qs =>
      val ranks = qs.map(_.getLong(1)).sorted.toSeq
      assert(ranks === (1L to qs.length.toLong))
      // rrf non-increasing in rank
      val byRank = qs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(byRank === byRank.sorted.reverse)
      // no query returns itself
      assert(!qs.exists(r => r.getLong(2) == r.getLong(0)))
    }
  }

  test("semantic leg top-1 agrees with brute-force cosine top-1") {
    val t = graft.core.Tables(spark, sf0001)
    val embs = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val sem = HybridSearch.semanticTopN(
      embs, embs.where(col("doc_id") % 97 === 0), "doc_id", "embedding", n = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = Similarity.bruteTopK(
      t.embeddings, t.embeddings.where(col("vec_id") % 97 === 0),
      "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sem === brute)
  }
}
