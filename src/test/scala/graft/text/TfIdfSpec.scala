package graft.text

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches the Okapi closed form on a tiny corpus") {
    // doc1 = "a a b" (dl=3), doc2 = "a c" (dl=2); N=2, avgdl=2.5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    val out = TfIdf.bm25(docs, "id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap

    def okapi(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (2.0 - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.5))
    }
    assert(math.abs(out((1L, "b")) - okapi(1, 1, 3)) < 1e-12)
    assert(math.abs(out((1L, "a")) - okapi(2, 2, 3)) < 1e-12)
    assert(math.abs(out((2L, "c")) - okapi(1, 1, 2)) < 1e-12)
    // rare term outranks the ubiquitous term within the same doc even at
    // lower tf: that's the idf part doing its job
    assert(out((1L, "b")) > out((1L, "a")))
    // idf is the standard always-positive form
    out.values.foreach(v => assert(v > 0))
  }

  test("bm25 tf saturation: doubling tf gains less than double the score") {
    val docs = Seq((1L, "x y"), (2L, "x x y y z")).toDF("id", "text")
    val out = TfIdf.bm25(docs, "id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // same term, same df; tf 2 vs 1 (docs differ in length, but saturation
    // dominates: score ratio must be < 2)
    assert(out((2L, "x")) < 2 * out((1L, "x")))
  }
}
