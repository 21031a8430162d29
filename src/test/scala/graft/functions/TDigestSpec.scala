package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20000
  // deterministic, shuffled-looking uniform values 0..n-1
  private def values = (0 until n).map(i => ((i * 7919) % n).toDouble)

  test("quantile estimates respect the rank-error bound on uniform data") {
    val df = values.toDF("v").repartition(8)
    val sk = df.agg(TDigest.agg(col("v"), 100).as("sk"))
    val row = sk.select(
      TDigest.quantileCol(col("sk"), 0.5).as("p50"),
      TDigest.quantileCol(col("sk"), 0.99).as("p99"),
      TDigest.quantileCol(col("sk"), 0.01).as("p01")).head
    // uniform 0..n: value == rank*n, so rank band translates directly
    assert(math.abs(row.getDouble(0) - 0.5 * n) <= 0.02 * n, s"p50=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 0.99 * n) <= 0.005 * n, s"p99=${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - 0.01 * n) <= 0.005 * n, s"p01=${row.getDouble(2)}")
  }

  test("union of partial digests answers like one big digest") {
    val df = values.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "v")
    val partials = df.groupBy(col("g")).agg(TDigest.agg(col("v"), 100).as("sk"))
    assert(partials.count() === 7)
    val unioned = partials.agg(TDigest.unionAgg(col("sk")).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.5)).head.getDouble(0)
    val direct = df.agg(TDigest.agg(col("v"), 100).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.5)).head.getDouble(0)
    assert(math.abs(unioned - 0.5 * n) <= 0.03 * n, s"unioned=$unioned")
    assert(math.abs(unioned - direct) <= 0.03 * n)
  }

  test("the digest is a standing lake artifact: save, load, query") {
    val root = Files.createTempDirectory("graft_tdigest").toString
    val lake = graft.sources.LakeTable(spark, s"$root/sketches")
    val day1 = values.take(n / 2).toDF("v")
      .agg(TDigest.agg(col("v"), 100).as("sk")).withColumn("day", lit("d1"))
    val day2 = values.drop(n / 2).toDF("v")
      .agg(TDigest.agg(col("v"), 100).as("sk")).withColumn("day", lit("d2"))
    lake.write(day1.select("day", "sk"))
    lake.write(day2.select("day", "sk"), org.apache.spark.sql.SaveMode.Append)
    // month rollup reads ONLY the two stored sketches, never the raw rows
    val est = lake.read.agg(TDigest.unionAgg(col("sk")).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.9)).head.getDouble(0)
    assert(math.abs(est - 0.9 * n) <= 0.03 * n, s"rolled-up p90=$est")
  }

  test("digest stays bounded: centroids ~ O(delta log n), not O(rows)") {
    val bytes = values.toDF("v").agg(TDigest.agg(col("v"), 100).as("sk"))
      .head.getAs[Array[Byte]](0)
    val centroids = (bytes.length - 12) / 16
    // the 4nq(1-q)/delta cap admits O(delta * ln n) clusters (tails get
    // tiny caps); ~450 at n=20k, delta=100 — a ~7 KB sketch for any
    // row count at this scale, vs 20k buffered doubles for exact
    assert(centroids > 10 && centroids < 6 * 100 * math.log10(n),
      s"$centroids centroids for $n rows at delta=100")
  }

  test("nulls are skipped; empty digest yields NaN; singleton is exact") {
    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(3.0))
      .toDF("v").agg(TDigest.agg(col("v"), 100).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 1.0)).head.getDouble(0)
    assert(withNulls === 3.0)
    val empty = Seq.empty[Double].toDF("v")
      .agg(TDigest.agg(col("v"), 100).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.5)).head.getDouble(0)
    assert(empty.isNaN)
    val one = Seq(42.0).toDF("v").agg(TDigest.agg(col("v"), 100).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.99)).head.getDouble(0)
    assert(one === 42.0)
  }

  test("interpreted and codegen quantile paths agree") {
    val df = values.toDF("v").agg(TDigest.agg(col("v"), 100).as("sk"))
      .select(TDigest.quantileCol(col("sk"), 0.5).as("q"))
    val codegen = df.head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.head.getDouble(0) === codegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
