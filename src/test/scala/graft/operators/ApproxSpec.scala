package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The approximate scale-path aggregates: engine-tested for accuracy bounds
  * (approx algorithms intentionally differ across engines, so no oracle).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem partkeys") {
    val li = Tables(spark, sf001).lineitem
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"approx $approx vs exact $exact (err $err)")
  }

  test("approx_percentile brackets the exact percentile") {
    val o = Tables(spark, sf001).orders
    val exact = o.select(expr("percentile(o_totalprice, 0.5)")).head.getDouble(0)
    val approx = o.select(expr("approx_percentile(o_totalprice, 0.5, 1000)"))
      .head.getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx $approx vs exact $exact")
  }
}
