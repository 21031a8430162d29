package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class QualitySpec extends SparkSpec {

  test("report computes all rule violations in one aggregate pass") {
    val df = Quality.qQualityChecks(spark, sf0001)
    val rows = df.collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getLong(2) > 0)) // total
    // the synthetic data is clean by construction
    assert(rows.forall(_.getBoolean(3)), rows.mkString(";"))
    // every rule shares ONE scan (the claim that adding rules is free):
    // final AQE plan section only — the string repeats an Initial Plan
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("null rule values count as violations, not silent passes") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (null, "bad"), (3L, null))
      .toDF("id", "tag")
    val rep = Quality.report(df,
      Seq("id_not_null" -> col("id").isNotNull, "tag_ok" -> (col("tag") === "ok")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("id_not_null") === 1)
    assert(rep("tag_ok") === 2) // "bad" fails, null tag is a violation too
  }

  test("empty input reports zero violations, not NULLs") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    val rows = Quality.report(empty, Seq("id_not_null" -> col("id").isNotNull))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 0L) // violations
    assert(rows.head.getLong(2) === 0L) // total
    assert(rows.head.getBoolean(3))     // passed
  }

  test("enforce passes clean data through and fails dirty data loudly") {
    val orders = Tables(spark, sf0001).orders
    val out = Quality.enforce(orders, Seq("pk" -> col("o_orderkey").isNotNull))
    assert(out.count() === orders.count())
    val ex = intercept[IllegalArgumentException] {
      Quality.enforce(orders, Seq("impossible" -> (col("o_totalprice") < 0)))
    }
    assert(ex.getMessage.contains("impossible"))
  }
}
