package graft.operators

import graft.SparkSpec

/** Golden-plan assertions (SURVEY §4): the physical plans we rely on for
  * 100 TB scale actually materialize. If Catalyst stops picking these
  * shapes, perf regressed even though results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("orderBy+limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Sorting.topParts(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dimension joins broadcast (supplier-nation-region)") {
    val p = plan(Joins.supplierByRegion(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dims should not sort-merge:\n$p")
  }

  test("scalar cross join is a broadcast nested loop") {
    val p = plan(Joins.orderDayBuckets(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("column pruning reaches the parquet scan") {
    val p = plan(Projections.renameDrop(spark, sf0001))
    // scan should read exactly the 4 projected columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey"), p)
    assert(!readSchema.contains("p_type"), s"p_type not pruned:\n$readSchema")
    assert(!readSchema.contains("p_size"), s"p_size not pruned:\n$readSchema")
  }

  test("filter pushdown reaches the parquet scan") {
    import org.apache.spark.sql.functions.col
    val df = graft.core.Tables(spark, sf0001).orders
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"), p)
  }

  test("partial aggregation happens map-side (HashAggregate pair)") {
    val p = plan(Relational.q1PricingSummary(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  /** AQE plans print Final + Initial sections after an action; keep only
    * the final section so operator counts aren't doubled.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("funnel computes all three ordered stages over ONE user_id shuffle") {
    val p = plan(graft.analytics.Descriptive.funnel(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window \\[".r.findAllIn(p).size == 3, p)
  }

  test("rank family (dense/percent/cume/ntile) shares one Window and one shuffle") {
    val p = plan(Windows.rankFunctions(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window \\[".r.findAllIn(p).size == 1, p)
  }

  test("running distinct-count: both window specs run off ONE hash exchange") {
    // hash(custkey, priority) does not satisfy clustering on custkey, so
    // without the explicit prefix repartition this plan pays two shuffles
    val p = plan(Windows.runningDistinct(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window \\[".r.findAllIn(p).size == 2, p)
  }

  test("decayed engagement broadcasts the 1-row reference, one data shuffle") {
    val p = finalPlan(graft.analytics.Behavior.decayedEngagement(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only hash exchange is the per-user aggregate; the event scan
    // itself never shuffles before the weighting map
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("gap-fill joins the dense calendar by broadcast, never shuffling the fact side") {
    val p = finalPlan(graft.analytics.Behavior.gapFilledDaily(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("retention joins the first-month dim back by broadcast") {
    val p = finalPlan(graft.analytics.Behavior.retentionCohorts(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins, never a cartesian") {
    val p = finalPlan(Joins.existsSubquery(spark, sf0001))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("caseControl caps controls with a distributed window, not a driver-side limit") {
    import org.apache.spark.sql.functions.col
    val orders = graft.core.Tables(spark, sf0001).orders
    val df = graft.analytics.Cohort.caseControl(
      orders, "o_custkey", "o_orderpriority", "urgent")
    // semantics: controls = min(caseCount, available non-case entities),
    // the same cap the reference's limit(caseCount) applied
    val byLabel = df.groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nonCases = orders.select(col("o_custkey")).distinct().count() - byLabel(1)
    assert(byLabel(1) > 0)
    assert(byLabel(0) === math.min(byLabel(1), nonCases), byLabel)
    assert(df.groupBy(col("o_custkey")).count()
      .where(col("count") > 1).count() === 0, "an entity appeared as case AND control")
    // plan: the controls cap is a WindowExec row_number — the old
    // orderBy+limit planned TakeOrderedAndProject, which materializes
    // caseCount rows on the driver (OOM at cohort scale)
    val p = plan(df)
    assert(p.contains("Window"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CollectLimit"), p)
  }

  test("ivfPqTopK never shuffles the corpus through a join (broadcast-only)") {
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables(spark, sf0001).embeddings
    val df = graft.text.Ivf.ivfPqTopK(e, e.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nCells = 8, nProbe = 4,
      m = 16, pqCells = 16, shortlist = 30, buildSampleFraction = 0.5)
    val p = finalPlan(df)
    // probes, ADC tables, shortlist ids, and query vectors all broadcast
    // against the corpus scans; the only exchanges are the per-query
    // rank windows over the pruned candidate set
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join leaked into IVF-PQ:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("whole-stage codegen covers the agg pipeline") {
    val df = Relational.q1PricingSummary(spark, sf0001)
    df.collect() // finalize the AQE plan; codegen stages only appear then
    val p = plan(df)
    // codegen stages render as "*(n)" prefixes in the tree string
    assert(p.contains("*(1)"), p)
  }

  test("unigram-LM scoring joins the model by BROADCAST — the corpus never shuffles for it") {
    val df = graft.text.CorpusOps.unigramLogprob(spark, sf0001)
    df.collect() // finalize AQE
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"the vocab-size model table must broadcast, not sort-merge:\n$p")
  }

  test("reproducible corpus shuffle plans no Window (no global row-number serialization)") {
    val p = plan(graft.text.CorpusOps.corpusShuffle(spark, sf0001))
    assert(!p.contains("Window"), s"global window would serialize the shuffle:\n$p")
  }

  test("column profiler plans no Expand (the multi-count-distinct shuffle multiplier)") {
    val df = graft.analytics.Descriptive.profileColumns(spark, sf0001)
    df.collect()
    val p = plan(df)
    assert(!p.contains("Expand"),
      s"profiler fell back to the Expand-multiplied distinct plan:\n$p")
  }

  test("intra-doc token dedup is map-only: no aggregate, no hash-partition exchange") {
    val df = graft.text.CorpusOps.docTokenDedup(spark, sf0001)
    df.collect()
    val p = plan(df)
    assert(!p.contains("HashAggregate"),
      s"dedup should be a per-row expression, not an aggregate:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no grouping shuffle should exist:\n$p")
  }
}
