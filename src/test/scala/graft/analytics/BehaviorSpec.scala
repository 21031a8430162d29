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

  test("TWAP: segmented fold equals the global lead; no type-only window partition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Behavior.twapByType(spark, sf0001)
    // reference: the textbook single-window form (fine at test scale)
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val ref = graft.core.Tables(spark, sf0001).eventsRaw
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("dt", lead(col("ts"), 1).over(w) - col("ts"))
      .where(col("dt").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        round(sum(col("value") * col("dt")) / sum(col("dt")), 6).as("twap"),
        round(avg(col("value")), 6).as("plain_avg"))
      .orderBy(col("event_type"))
    assert(df.collect().toSeq === ref.collect().toSeq)
    // scale pin: the row-level fold must never sort the raw table into
    // |event_type| unsplittable window partitions — every Window over the
    // events partitions on MORE than the bare type (the bucket rides
    // along); only the bucket-level stitch frame may key on type alone,
    // and it windows over an aggregate, not the raw rows
    val analyzed = df.queryExecution.optimizedPlan
    val offenders = analyzed.collect {
      case wnd: org.apache.spark.sql.catalyst.plans.logical.Window
        if wnd.partitionSpec.length == 1 &&
          wnd.partitionSpec.head.references.toSeq.exists(_.name == "event_type") &&
          // the stitch window reads the (type, bucket) aggregate — one
          // row per bucket — recognizable by its first_ts input
          !wnd.child.output.exists(_.name == "first_ts") => wnd
    }
    assert(offenders.isEmpty,
      s"raw-row window partitioned on event_type alone:\n${offenders.mkString("\n")}")
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

  test("ewma fold matches the recurrence by hand") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // series [1,2,3,4] at α=0.25 seeded with the first value:
    // 1 -> 1.25 -> 1.6875 -> 2.265625
    val series = Seq((Seq(1.0, 2.0, 3.0, 4.0), "a"), (Seq(7.5), "b"))
      .toDF("series", "k")
    val out = series.select(col("k"), expr(
      "aggregate(slice(series, 2, size(series) - 1), element_at(series, 1), " +
        "(acc, x) -> 0.25d * x + 0.75d * acc)").as("ewma"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 2.265625) // exact: every term is a binary fraction
    assert(out("b") === 7.5) // single-element series returns its seed
  }

  test("holt fold matches the coupled level/trend recurrence by hand") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // [2,4,6,8] at α=0.5, γ=0.3 seeded (l=2, b=0):
    // (3, 0.3) -> (4.65, 0.705) -> (6.6775, 1.10175)
    val out = Seq(Seq(2.0, 4.0, 6.0, 8.0)).toDF("vs")
      .select(expr(
        "aggregate(slice(vs, 2, size(vs) - 1), " +
          "named_struct('l', element_at(vs, 1), 'b', cast(0.0 as double)), " +
          "(acc, x) -> named_struct(" +
          "'l', 0.5d * x + 0.5d * (acc.l + acc.b), " +
          "'b', 0.3d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l) + 0.7d * acc.b))")
        .as("h"))
      .select(col("h.l"), col("h.b")).head
    assert(out.getDouble(0) === 6.6775)
    assert(out.getDouble(1) === 1.10175)
  }

  test("holt query trends: level tracks the data scale, forecast extends it") {
    val rows = Behavior.holtTrend(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (level, trend, f3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(level > 0.0 && !trend.isNaN)
      assert(math.abs(f3 - (level + 3 * trend)) < 1e-4)
    }
  }

  test("ewma query emits one row per event type with bounded values") {
    val rows = Behavior.ewmaDaily(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L, "every present type has at least one day")
      assert(!r.getDouble(2).isNaN && r.getDouble(2) > 0.0)
    }
  }

  test("transition probabilities are a proper distribution per prev state") {
    val rows = Behavior.eventTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, grp) =>
      val total = grp.map(_.getDouble(3)).sum
      // rounded to 6 decimals per row, so allow k rows' worth of slack
      assert(math.abs(total - 1.0) < 1e-5 * grp.length + 1e-6,
        s"p_next for prev=$prev sums to $total")
    }
  }

  test("decayed engagement is bounded by the undecayed sum and decays with age") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val decayed = Behavior.decayedEngagement(spark, sf0001)
    val plain = graft.core.Tables(spark, sf0001).eventsRaw
      .groupBy(col("user_id")).agg(sum(col("value")).as("total"))
    val joined = decayed.join(plain, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val d = r.getDouble(1); val t = r.getDouble(3)
      assert(d <= t + 1e-6, s"decayed $d exceeds raw sum $t")
    }
    // synthetic: same value 30 days apart -> older event carries half weight
    val dayNs = 86400L * 1000000000L
    val ev = Seq((1L, 60L * dayNs, 1L, "t", 100.0), (1L, 30L * dayNs, 2L, "t", 100.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val ref = ev.agg(max(expr(s"ts div $dayNs")).as("d_max"))
    val score = ev
      .select(col("user_id"), expr(s"ts div $dayNs").as("d"), col("value"))
      .crossJoin(broadcast(ref))
      .groupBy(col("user_id"))
      .agg(sum(col("value") *
        pow(lit(0.5), (col("d_max") - col("d")).cast("double") / 30.0)).as("s"))
      .head.getDouble(1)
    assert(math.abs(score - 150.0) < 1e-9, s"expected 100 + 100/2, got $score")
  }

  test("ewma/holt SQL spellings are bit-identical to the DataFrame folds") {
    // the SQL functions EXPAND to the same aggregate() composition, so
    // equality must hold exactly, not approximately
    assert(Behavior.ewmaSql(spark, sf0001).collect().toSeq ===
      Behavior.ewmaDaily(spark, sf0001).collect().toSeq)
    assert(Behavior.holtSql(spark, sf0001).collect().toSeq ===
      Behavior.holtTrend(spark, sf0001).collect().toSeq)
  }

  test("ewma/holt_smooth SQL functions: seed, recursion step, and null/empty") {
    import spark.implicits._
    Seq((1, Seq(10.0, 20.0)), (2, Seq(4.0)), (3, Seq.empty[Double]))
      .toDF("id", "vs").createOrReplaceTempView("sm_edge")
    val e = spark.sql(
      "SELECT id, ewma(vs, 0.25D) AS e, holt_smooth(vs, 0.5D, 0.3D) AS h " +
        "FROM sm_edge ORDER BY id").collect()
    // one step: 0.25*20 + 0.75*10 = 12.5
    assert(e(0).getDouble(1) === 12.5)
    val h0 = e(0).getStruct(2)
    // l2 = 0.5*20 + 0.5*(10+0) = 15; b2 = 0.3*(15-10) + 0.7*0 = 1.5
    assert(h0.getDouble(0) === 15.0 && h0.getDouble(1) === 1.5)
    // single element: seed only
    assert(e(1).getDouble(1) === 4.0)
    assert(e(1).getStruct(2).getDouble(0) === 4.0 &&
      e(1).getStruct(2).getDouble(1) === 0.0)
    // empty array folds to NULL, not an error
    assert(e(2).isNullAt(1) && e(2).isNullAt(2))
    // NULL array likewise
    assert(spark.sql(
      "SELECT ewma(CAST(NULL AS ARRAY<DOUBLE>), 0.25D)").head.isNullAt(0))
  }
}
