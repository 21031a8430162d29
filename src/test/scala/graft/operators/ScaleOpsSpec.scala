package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Scale-layout operators: bucketed co-located joins (no exchange) and
  * skew salting (bag-equal results).
  */
class ScaleOpsSpec extends SparkSpec {

  test("bucketed join runs without any shuffle exchange") {
    val t = Tables(spark, sf0001)
    Bucketing.writeBucketed(t.orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(t.customer, "b_customer", "c_custkey", 8)
    // force sort-merge: at test scale the dim side would be broadcast,
    // which makes the planner skip bucketed scans entirely — the claim
    // under test is the big-big co-located join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // content identical to the plain join
      val expected = t.orders.join(t.customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted join is bag-equal to the plain join") {
    val t = Tables(spark, sf0001)
    val plain = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val salted = Skew.saltedJoin(t.orders, t.customer, "o_custkey", "c_custkey", 4)
      .select("o_orderkey", "c_custkey")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("salted join spreads a hot key over saltFactor partitions' worth of salts") {
    import spark.implicits._
    val hotFact = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val dim = Seq((1L, "only")).toDF("dk", "dv")
    val out = Skew.saltedJoin(hotFact, dim, "k", "dk", 8)
    assert(out.count() === 1000)
    // distinct salts actually used on the fact side before the drop
    val salts = hotFact
      .withColumn("__salt", pmod(abs(hash(struct(hotFact.columns.map(col): _*))), lit(8)))
      .select("__salt").distinct().count()
    assert(salts === 8L)
  }
}
