package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class PqSpec extends SparkSpec {

  test("encode: m codes per vector, every code a valid cell id") {
    val e = Tables(spark, sf0001).embeddings
    val books = Pq.fitCodebooks(e, "embedding", m = 16, k = 16)
    val codes = Pq.encode(e, books, "embedding")
      .select(col("codes")).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](0)
      assert(cs.length === 16)
      assert(cs.forall(c => c >= 0 && c < 16), s"code out of range: $cs")
    }
  }

  test("adc top-k: k rows per query, descending approx score, no self-match") {
    val e = Tables(spark, sf0001).embeddings
    val out = Pq.pqTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .collect()
    assert(out.length === 25)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to 5L))
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
      assert(!rows.exists(_.getLong(2) === q), "self-match")
    }
  }

  test("refined pq recall vs brute force is high at test scale") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Pq.pqTopK(e, q, "vec_id", "embedding", k = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Pq.pqTopK(e, q, "vec_id", "embedding", k = 3, shortlist = 50)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = brute.intersect(raw).size.toDouble / brute.size
    val refRecall = brute.intersect(refined).size.toDouble / brute.size
    // raw ADC ordering is noisy on a near-random corpus (codes carry 64
    // bits of a 2048-bit vector); the exact re-rank only needs the true
    // neighbor INSIDE the 50-candidate shortlist
    assert(refRecall >= 0.7, s"refined recall $refRecall too low (raw $rawRecall)")
    assert(refRecall >= rawRecall,
      s"refine made recall worse: $refRecall < $rawRecall")
  }

  test("codebooks round-trip through a lake table and encode identically") {
    val e = Tables(spark, sf0001).embeddings
    val books = Pq.fitCodebooks(e, "embedding", m = 16, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Pq.saveCodebooks(books, s"$dir/idx")
    val loaded = Pq.loadCodebooks(spark, s"$dir/idx")
    def codesOf(b: org.apache.spark.sql.DataFrame) =
      Pq.encode(e, b, "embedding").select("vec_id", "codes")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codesOf(loaded) === codesOf(books))
  }

  test("sampled codebook fit keeps recall close to full fit") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.where(col("vec_id") < 20)
    def hits(frac: Double): Set[(Long, Long)] =
      Pq.pqTopK(e, q, "vec_id", "embedding", k = 3, buildSampleFraction = frac,
        shortlist = 50)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = brute.intersect(hits(1.0)).size.toDouble / brute.size
    val sampled = brute.intersect(hits(0.5)).size.toDouble / brute.size
    assert(sampled >= full - 0.15,
      s"sampled-fit recall $sampled fell too far below full-fit $full")
  }
}
