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

  /** Set confs, run, restore previous values whatever happens. */
  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective join injects a runtime bloom filter on the big side") {
    // At 100 TB the win: a selective dim filter becomes a bloom filter
    // pushed into the fact scan, dropping most rows BEFORE the join
    // shuffle. Thresholds here are shrunk so sf0.001 qualifies; the
    // assertion is that the engine's plans LET Spark do this (no
    // bloom-hostile shapes in between).
    val t = Tables(spark, sf0001)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B") {
      val sel = t.part.where(col("p_brand") === "Brand#1")
      val joined = t.lineitem.join(sel, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_name"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      val withBloom = joined.count()
      // baseline MUST come from a bloom-free plan, or a lossy filter
      // would agree with itself and the assertion proves nothing
      val baseline = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        t.lineitem.join(sel, col("l_partkey") === col("p_partkey")).count()
      }
      assert(withBloom === baseline)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key dominating the fact side: the classic straggler. With
    // skew-join thresholds scaled to test data, AQE must mark and split
    // the skewed partition rather than letting one task carry it all.
    val fact = spark.range(0, 60000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("v"))
    val dim = (0L to 100L).map(k => (k, s"d$k")).toDF("dk", "dv")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB") {
      val joined = fact.join(dim, col("k") === col("dk"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"skew join not triggered:\n$plan")
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
