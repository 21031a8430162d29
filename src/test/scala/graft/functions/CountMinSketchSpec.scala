package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Seq.tabulate(2000)(i => s"w${i % 300}") // 300 distinct, skewed-ish counts

  test("estimates never undercount and sit within the 8N/width bound on every key") {
    val df = words.toDF("w")
    val sk = df.agg(CountMinSketch.agg(col("w"), depth = 5, width = 1024).as("sk"))
      .head.getAs[Array[Byte]](0)
    val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val slack = math.ceil(words.size * 8.0 / 1024).toLong
    exact.foreach { case (w, n) =>
      val est = CountMinSketch.estimate(
        sk, org.apache.spark.unsafe.types.UTF8String.fromString(w))
      assert(est >= n, s"$w undercounted: $est < $n")
      assert(est <= n + slack, s"$w overcounted past the bound: $est > $n + $slack")
    }
    // a never-seen key estimates within the pure-collision bound
    val ghost = CountMinSketch.estimate(
      sk, org.apache.spark.unsafe.types.UTF8String.fromString("never-seen"))
    assert(ghost >= 0 && ghost <= slack)
  }

  test("merged per-group sketches are BYTE-IDENTICAL to a single global build") {
    val df = words.zipWithIndex.map { case (w, i) => (w, i % 7) }.toDF("w", "g")
    val global = df.agg(CountMinSketch.agg(col("w")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val merged = df.groupBy(col("g"))
      .agg(CountMinSketch.agg(col("w")).as("sk"))
      .agg(CountMinSketch.mergeAgg(col("sk")).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(global, merged),
      "additive counters must make merge order invisible")
  }

  test("serialization round-trip preserves every counter") {
    val s = new CountMinSketch.State(3, 64)
    words.take(100).foreach(w =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    val back = CountMinSketch.deserialize(CountMinSketch.serialize(s))
    assert(back.depth === 3 && back.width === 64)
    assert(back.counters.toSeq === s.counters.toSeq)
  }

  test("cms_estimate: interpreted and codegen paths agree") {
    val df = words.toDF("w")
    val withSk = df.crossJoin(broadcast(
      df.agg(CountMinSketch.agg(col("w")).as("sk"))))
    val q = withSk.select(CountMinSketch.estimateCol(col("sk"), col("w")).as("e"))
      .limit(50)
    val codegen = q.as[Long].collect().toSeq
    val savedWhole = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def restore(key: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(q.as[Long].collect().toSeq === codegen)
    finally {
      restore("spark.sql.codegen.wholeStage", savedWhole)
      restore("spark.sql.codegen.factoryMode", savedMode)
    }
  }

  test("merge refuses mismatched shapes; estimates of numerics stringify like the builder") {
    val a = new CountMinSketch.State(5, 64)
    val b = new CountMinSketch.State(5, 128)
    intercept[IllegalArgumentException](a.mergeFrom(b))
    val df = Seq(101L, 101L, 202L).toDF("k")
    val sk = df.agg(CountMinSketch.agg(col("k")).as("sk")).head.getAs[Array[Byte]](0)
    assert(CountMinSketch.estimate(
      sk, org.apache.spark.unsafe.types.UTF8String.fromString("101")) >= 2L)
  }
}
