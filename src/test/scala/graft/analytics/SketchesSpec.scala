package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SketchesSpec extends SparkSpec {

  test("per-group HLL estimates sit within 2% of exact") {
    val rows = Sketches.hllDistinctCustomers(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "some group exceeded the 2% bound")
  }

  test("unioned partial sketches match a direct global sketch") {
    val orders = Tables(spark, sf001).orders
    val merged = Sketches
      .hllUnionEstimate(orders, "o_orderstatus", "o_custkey")
      .head().getLong(0)
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))))
      .head().getLong(0)
    // same keys, same lgK -> identical sketch contents after union
    assert(merged == direct)
    val exact = orders.select(col("o_custkey")).distinct().count()
    assert(math.abs(merged - exact).toDouble / exact <= 0.02)
  }
}
