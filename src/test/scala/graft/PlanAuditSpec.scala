package graft

import org.apache.spark.sql.DataFrame

/** Exchange-count pins for the round-9 corpus/behavior queries — the
  * shuffle budget each plan was DESIGNED to (AQE plans print final +
  * initial sections, so every bound is the doubled count). A regression
  * that sneaks an extra corpus-wide shuffle into one of these (a lost
  * broadcast, a window repartition) trips the bound.
  */
class PlanAuditSpec extends SparkSpec {

  private def exchanges(df: DataFrame): Int = {
    df.collect()
    "Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString).length
  }

  test("shuffle budgets hold") {
    val budgets: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame, Int)] = Seq(
      // map-only signals: output ordering + the deliberate scan-spread
      // exchange (Tables.spreadScan — round-16: the per-row signal
      // compute is the query's whole cost and a single-split scan
      // serialized it onto one core; the spread is a no-op the moment
      // the scan has real parallelism, and the budget still forbids any
      // corpus-wide shuffle beyond it)
      ("q_repetition_signals", graft.text.CorpusOps.repetitionSignals _, 4),
      ("q_word_entropy", graft.text.CorpusOps.wordEntropy _, 4),
      // model-then-score: vocab rollup + limit + per-doc rollup + order
      ("q_vocab_coverage", graft.text.TextQueries.vocabCoverage _, 8),
      // both windows and the session rollup share the user partitioning
      ("q_session_paths", graft.analytics.Behavior.sessionPaths _, 4),
      // daily rollup + per-key series + order
      ("q_ewma_daily", graft.analytics.Behavior.ewmaDaily _, 6),
      // line build + hot rollup + rebuild rollup + order (two corpus
      // passes by construction — the hot set must exist before rebuild)
      ("q_line_dedup", graft.text.CorpusOps.qLineDedup _, 10),
      // one VectorMean aggregate per side + a groups-sized join + order;
      // the corpus must never join row-to-row
      ("q_embedding_drift", graft.sources.SourceQueries.embeddingVersionDrift _, 8)
    )
    budgets.foreach { case (name, q, budget) =>
      val n = exchanges(q(spark, sf0001))
      assert(n <= budget, s"$name planned $n exchange sections, budget $budget")
    }
  }

  test("rank-filtered window top-k keeps the partial WindowGroupLimit below the shuffle") {
    // Spark 4's InferWindowGroupLimit turns `row_number() ... WHERE rank
    // <= k` into a PARTIAL per-partition top-k BEFORE the hash exchange —
    // at 100 TB that is the difference between shuffling k rows per group
    // per map partition and shuffling every candidate row. The pattern
    // only fires while the filter sits directly on the rank column of a
    // single rank-like window function, so pin it: a refactor that breaks
    // the shape (e.g. rounding cos AFTER ranking in a way that detaches
    // the filter) would silently reintroduce the full shuffle.
    Seq[(String, DataFrame)](
      ("q_cosine_topk", graft.text.TextQueries.cosineTopK(spark, sf0001)),
      ("q_euclidean_topk", graft.text.TextQueries.euclideanTopK(spark, sf0001))
    ).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
        s"$name lost the partial window group limit:\n$plan")
    }
    // global top-k stays a TakeOrderedAndProject (never a full sort)
    val topk = graft.operators.Sorting.queries("q_topk_parts")(spark, sf0001)
    topk.collect()
    assert(topk.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("dynamic partition pruning fires through the lake read path") {
    // a fact-partitioned lake table joined to a small filtered dim must
    // scan only the dim's partitions — at 100 TB DPP is the difference
    // between reading 2 partitions and all of them, and it only works
    // if our lake read presents a plain partitioned scan Catalyst can
    // inject the runtime filter into (a wrapped/manual file listing
    // would silently disable it)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = (1L to 20000L).map(i => (s"d${i % 30}", i, i * 1.0))
      .toDF("day", "id", "v")
    val lake = graft.sources.LakeTable(spark, s"$dir/t")
      .writePartitioned(fact, Seq("day"))
    // DPP keys on a SELECTIVE dim-side predicate (an unfiltered dim has
    // nothing to prune with) — the realistic shape: a dim table filtered
    // to the slice of interest. NOT a LocalRelation: ConvertToLocal-
    // Relation folds its filter away and DPP then sees no predicate
    val dim = spark.range(0, 30)
      .select(concat(lit("d"), col("id")).as("day"),
        when(col("id").isin(3, 7), "keep").otherwise("drop").as("tag"))
      .where(col("tag") === "keep")
    val j = lake.read.join(dim, Seq("day")).groupBy(col("day")).agg(sum(col("v")))
    j.collect()
    // the physical plan STRING truncates scan metadata, so assert on the
    // optimized plan's injected filter and on what the scan actually read
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in the scan:\n$opt")
    // AQE hides the scan behind adaptive/stage wrappers — unwrap them
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScan(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: QueryStageExec => findScan(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(findScan)
      }
    val scanned = findScan(j.queryExecution.executedPlan)
      .headOption.map(_.metrics("numFiles").value)
      .getOrElse(fail("no file scan in the plan"))
    val total = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(scanned > 0 && scanned <= total / 3,
      s"DPP should scan only the 2 surviving partitions of 30 " +
        s"($scanned of $total files read)")
  }

  test("runtime bloom filter injects into the shuffle join when the dim side filters") {
    // the row-level sibling of DPP: a selective dim predicate on a
    // NON-partition join key makes Catalyst build a bloom filter from
    // the dim and apply it to the fact scan BEFORE the shuffle — at
    // 100 TB that is most of the fact never leaving the mappers. The
    // defaults gate on a 10 GB fact scan, so at test scale the
    // thresholds must come down; at cluster scale they fire as-is.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1MB")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val dir = java.nio.file.Files.createTempDirectory("graft_bloomrf").toString
      spark.range(0, 200000)
        .select(col("id"), pmod(col("id"), lit(10000)).as("k"), (col("id") * 1.0).as("v"))
        .write.parquet(s"$dir/fact")
      spark.range(0, 10000)
        .select(col("id").as("k"), pmod(col("id"), lit(1000)).as("tag"))
        .write.parquet(s"$dir/dim")
      val j = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim").where(col("tag") === 7), Seq("k"))
        .agg(sum(col("v")))
      j.collect()
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter"),
        s"expected an injected runtime bloom filter:\n$opt")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
