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

  test("a subspace with fewer than k distinct subvectors fails loudly, not silently") {
    val s = spark
    import s.implicits._
    // 4 near-identical vectors can seed at most 4 cells per subspace —
    // far short of k=16; the old nonEmpty check let this through and
    // adcTopK's flattened j*k+code lookup then read the wrong slots
    val tiny = (0 until 4).map(i =>
      (i.toLong, Array.fill(8)(if (i == 0) 1.0f else i.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.fitCodebooks(tiny, "embedding", m = 2, k = 16)
    }
    assert(e.getMessage.contains("increase sampleFraction"), e.getMessage)
  }

  test("all-zero vectors don't NaN-poison the fit or the ADC ranking") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      val v = if (i == 0L) Array.fill(8)(0.0f)
      else Array.fill(8)(rng.nextFloat() - 0.5f)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pq.pqTopK(df, df.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, m = 2, nCells = 8).collect()
    assert(out.length === 9)
    out.foreach { r =>
      val score = r.getDouble(3)
      assert(!score.isNaN, s"NaN approx score leaked: $r")
    }
    // query 0 IS the zero vector: its table is all zeros, ranking falls
    // back to the deterministic n_id tie-break instead of NaN ordering
    val q0 = out.filter(_.getLong(0) === 0L).sortBy(_.getLong(1)).map(_.getLong(2))
    assert(q0.toSeq === q0.sorted.toSeq, s"zero-query ranking not deterministic: ${q0.toSeq}")
  }
}
