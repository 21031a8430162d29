package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SamplingSpec extends SparkSpec {

  test("stratified sample is deterministic given the seed") {
    val c = Tables(spark, sf001).customer
    val fr: Map[Any, Double] = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.1)
    def run() = Sampling.stratified(c, "c_mktsegment", fr, seed = 42L)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(run() === run())
  }

  test("stratified fractions are approximately honored") {
    val c = Tables(spark, sf001).customer
    val base = c.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.stratified(
      c, "c_mktsegment", Map[Any, Double]("BUILDING" -> 0.5), 42L)
    val got = out.count().toDouble
    val expected = base("BUILDING") * 0.5
    assert(math.abs(got - expected) / expected < 0.25, s"got $got vs ~$expected")
  }

  test("deterministic stratified sample is partition-independent, row-exact") {
    val docs = Tables(spark, sf001).documents
    val fr = Map("en" -> 0.3, "de" -> 0.7)
    def ids(part: Int) = Sampling.deterministicStratified(
      docs.repartition(part), "lang", "doc_id", fr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sampleBy would keep DIFFERENT rows under a different partitioning;
    // the md5 sampler keeps the identical set
    val one = ids(1)
    assert(one === ids(13))
    assert(one.nonEmpty)
    // rates approximately honored per stratum
    val kept = Sampling.deterministicStratified(docs, "lang", "doc_id", fr)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, f) <- fr) {
      val got = kept.getOrElse(l, 0L).toDouble / base(l)
      assert(math.abs(got - f) < 0.2, s"$l: got rate $got want ~$f")
    }
    // strata not in the rate map are excluded entirely
    assert(!kept.contains("zh"))
  }

  test("balanced downsampling equalizes strata within tolerance") {
    val docs = Tables(spark, sf001).documents
    val out = Sampling.balanced(docs, "lang", seed = 7L)
    val counts = out.groupBy("lang").count()
      .collect().map(_.getLong(1))
    val (mn, mx) = (counts.min.toDouble, counts.max.toDouble)
    assert(mx / mn <= 1.6, s"strata spread too wide: ${counts.toSeq}")
  }

  test("stopword removal drops only stopwords and keeps duplicate tokens") {
    import spark.implicits._
    val out = Seq("the cat sat on the cat mat").toDF("t")
      .select(graft.text.TextFunctions.removeStopwords(
        graft.text.TextFunctions.tokens(col("t")), "en"))
      .head.getSeq[String](0)
    // duplicates must survive (term frequencies downstream depend on it)
    assert(out === Seq("cat", "sat", "on", "cat", "mat"))
  }

  test("weighted sample is partition-independent and favors heavy weights") {
    import spark.implicits._
    // 900 light rows (w=1) + 100 heavy rows (w=50): A-Res inclusion is
    // proportional to weight, so heavy rows should dominate a k=100 draw
    val rows = (0L until 900L).map(i => (i, 1.0)) ++
      (900L until 1000L).map(i => (i, 50.0))
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(a === b, "sample must be a pure function of ids, not partitioning")
    val heavy = a.count(_ >= 900L)
    assert(heavy >= 60, s"heavy rows underrepresented: $heavy/100")
    // non-positive weights are excluded outright
    val withZero = rows.toDF("id", "w")
      .union(Seq((5000L, 0.0), (5001L, -1.0)).toDF("id", "w"))
    val c = Sampling.weightedSample(withZero, "id", "w", k = 2000)
      .select("id").as[Long].collect().toSet
    assert(!c.contains(5000L) && !c.contains(5001L))
    assert(c.size === 1000)
  }

  test("balanced sampling of an empty frame returns empty, not a crash") {
    val empty = Tables(spark, sf001).documents.where(col("lang") === "nope")
    assert(Sampling.balanced(empty, "lang", 1L).count() === 0L)
  }
}
