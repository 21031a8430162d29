package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k; within ~3 RSDs above k") {
    val small = (1 to 500).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 1024).as("sk"))
      .select(KmvSketch.estimateCol(col("sk"))).head.getDouble(0)
    assert(small === 500.0, "under k the sketch IS the distinct set")
    val big = (1 to 100000).map(_.toString).toDF("v").repartition(8)
      .agg(KmvSketch.agg(col("v"), 1024).as("sk"))
      .select(KmvSketch.estimateCol(col("sk"))).head.getDouble(0)
    assert(math.abs(big - 100000) <= 100000 * 0.1, s"estimate $big")
  }

  test("duplicates don't inflate; partitioning doesn't change the sketch") {
    val once = (1 to 5000).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 256).as("sk")).head.getAs[Array[Byte]](0)
    val dup = ((1 to 5000) ++ (1 to 5000)).map(_.toString).toDF("v")
      .repartition(16)
      .agg(KmvSketch.agg(col("v"), 256).as("sk")).head.getAs[Array[Byte]](0)
    assert(once.toSeq === dup.toSeq,
      "k smallest distinct hashes are order/partition/duplication invariant")
  }

  test("union across groups equals one global sketch") {
    val df = (1 to 20000).map(i => (i % 5, i.toString)).toDF("g", "v")
    val viaUnion = df.groupBy(col("g"))
      .agg(KmvSketch.agg(col("v"), 512).as("sk"))
      .agg(KmvSketch.unionAgg(col("sk")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val direct = df.agg(KmvSketch.agg(col("v"), 512).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(viaUnion.toSeq === direct.toSeq, "KMV union is exact, not approximate")
  }

  test("intersection estimate tracks true overlap") {
    // A = 1..30000, B = 20001..50000 -> |A∩B| = 10000
    val a = (1 to 30000).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 2048).as("sk")).head.getAs[Array[Byte]](0)
    val b = (20001 to 50000).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 2048).as("sk")).head.getAs[Array[Byte]](0)
    val est = KmvSketch.intersectEstimate(a, b)
    assert(math.abs(est - 10000) <= 10000 * 0.15, s"intersection est $est")
    // disjoint sets estimate ~0
    val c = (90001 to 95000).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 2048).as("sk")).head.getAs[Array[Byte]](0)
    val disjoint = KmvSketch.intersectEstimate(a, c)
    assert(disjoint <= 30000 * 0.01, s"disjoint est $disjoint")
  }

  test("serialization round-trips; codegen and interpreted agree") {
    val df = (1 to 3000).map(_.toString).toDF("v")
      .agg(KmvSketch.agg(col("v"), 128).as("sk"))
      .select(KmvSketch.estimateCol(col("sk")).as("e"))
    val codegen = df.head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.head.getDouble(0) === codegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("declared query: all three bound booleans hold at sf0.001") {
    val r = graft.analytics.Sketches.kmvSetOps(spark, sf0001).head
    assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5), r.toString)
  }
}
