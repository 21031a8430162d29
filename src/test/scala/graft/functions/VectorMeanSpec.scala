package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("centroid of known vectors") {
    val df = Seq(
      (1, Array(1.0f, 2.0f)), (1, Array(3.0f, 4.0f)), (2, Array(10.0f, 0.0f))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorMean(col("v")).as("c"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 3.0))
    assert(out(1).getSeq[Double](1) === Seq(10.0, 0.0))
  }

  test("null arrays are ignored; all-null group yields null") {
    val df = Seq(
      (1, Some(Array(2.0, 4.0))), (1, None), (2, None)
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorMean(col("v")).as("c"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 4.0))
    assert(out(1).isNullAt(1))
  }

  test("arrays with a null slot are skipped whole, not summed as 0.0") {
    val df = Seq(
      (1, Seq[java.lang.Double](2.0, 4.0)),
      (1, Seq[java.lang.Double](1.0, null)), // must be ignored, not (1,0)
      (2, Seq[java.lang.Double](3.0, null))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorMean(col("v")).as("c"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 4.0))
    assert(out(1).isNullAt(1), "a group with only malformed vectors yields null")
  }

  test("partial merge across many partitions agrees with single partition") {
    val df = (1 to 1000).map(i => (i % 3, Array(i.toDouble, -i.toDouble))).toDF("g", "v")
    val wide = df.repartition(16).groupBy("g").agg(VectorMean(col("v")).as("c"))
    val narrow = df.coalesce(1).groupBy("g").agg(VectorMean(col("v")).as("c"))
    val a = wide.orderBy("g").collect().map(_.getSeq[Double](1))
    val b = narrow.orderBy("g").collect().map(_.getSeq[Double](1))
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (p, q) => assert(math.abs(p - q) < 1e-9) }
    }
  }
}
