package graft.analytics

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {

  test("anomaly z-score: one WindowExec serves all three frame aggregates") {
    val df = Behavior.anomalyZscore(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "anomalies cannot exceed scored")
      assert(r.getDouble(3) >= 0.0)
    }
    val plan = df.queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).length
    assert(windows <= 2, // AQE prints final+initial sections
      s"expected ONE window operator (shared spec), plan had $windows:\n$plan")
  }

  test("the current row never dilutes its own baseline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 19 calm values then one spike: with an inclusive frame the spike
    // would inflate sd and damp its own z; excluded, z is huge
    val ev = (1 to 19).map(i => (1L, i.toLong, i.toLong, "t", 10.0 + (i % 3) * 0.1)) :+
      ((1L, 20L, 20L, "t", 500.0))
    val df = ev.toDF("user_id", "ts", "event_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val z = df
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .where(col("ts") === 20L)
      .select(((col("value") - col("mu")) / col("sd")).as("z"))
      .head.getDouble(0)
    assert(z > 100, s"spike z should be extreme, got $z")
  }
}
