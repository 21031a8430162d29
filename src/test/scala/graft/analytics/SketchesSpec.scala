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

  test("Misra-Gries guarantee holds under any partitioning: heavy items present, counts are lower bounds") {
    import spark.implicits._
    // skewed stream: item "hot_i" appears (i+1)*60 times, 100 singletons;
    // N = 1000, so the N/(k+1)=58 heaviness bar sits just under hot_0's 60
    val rows = (0 until 5).flatMap(i => Seq.fill((i + 1) * 60)(s"hot_$i")) ++
      (0 until 100).map(i => s"rare_$i")
    val n = rows.size
    val k = 16
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.filter(_._2 > n / (k + 1))
    assert(heavy.size === 5, "test data must plant exactly the hot items as heavy")
    for (parts <- Seq(1, 3, 32)) {
      val out = scala.util.Random.shuffle(rows).toDF("item")
        .repartition(parts)
        .agg(graft.functions.FrequentItems(col("item"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k)
      heavy.foreach { case (item, true_n) =>
        val est = out.getOrElse(item, fail(s"heavy item $item missing at parts=$parts"))
        assert(est <= true_n, s"$item overestimated: $est > $true_n")
        assert(true_n - est <= n / (k + 1),
          s"$item undercount ${true_n - est} beyond bound ${n / (k + 1)}")
      }
    }
  }

  test("heavy-hitter declared query: top-10 all found, counts exact") {
    val rows = Sketches.heavyHitterTokens(spark, sf001).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getBoolean(2)), "a true heavy hitter escaped the sketch")
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
