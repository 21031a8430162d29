package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {

  test("bruteTopK: k rows per query, descending cosine, no self-match") {
    val e = Tables(spark, sf0001).embeddings
    val out = Similarity.bruteTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding", 5)
      .collect()
    assert(out.length === 25)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to 5L))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
      assert(!rows.exists(_.getLong(2) === q), "self-match")
    }
  }

  test("lshTopK recall vs brute force is reasonable at test scale") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 64, 3,
      nPlanes = 4, nTables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("ivfTopK recall vs brute force is reasonable at test scale") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.ivfTopK(e, q, "vec_id", "embedding", 3, nCells = 8, nProbe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("lshTopK is deterministic given the seed") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.where(col("vec_id") < 3)
    def run() = Similarity.lshTopK(e, q, "vec_id", "embedding", 64, 3)
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}
