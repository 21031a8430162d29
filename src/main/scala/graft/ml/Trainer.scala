package graft.ml

import org.apache.spark.ml.classification.{DecisionTreeClassificationModel, DecisionTreeClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame

/** Decision-tree training with seeded hyperparameter search (SURVEY §2
  * K3/K4/K6).
  *
  * The reference searches with hyperopt TPE, 20 evals over
  * {max_depth ∈ [2,25], max_bins ∈ {8,16,32,64}, impurity ∈ {gini,entropy}}
  * (02-patient-trajectory.py:236-259). No hyperopt on the JVM: [[search]]
  * keeps the contract (argmax AUC over 20 evaluations of that space) with
  * a seeded explore/exploit loop that, like TPE, spends the tail of the
  * budget near the incumbent instead of uniformly — dependency-free and
  * deterministic. [[searchRandom]] is the pure uniform sampler, kept as
  * the baseline the adaptive loop must beat (PipelineSpec asserts it).
  * Each eval is a distributed fit; the loop itself is driver-side exactly
  * like the reference's Trials loop.
  */
object Trainer {

  case class Params(maxDepth: Int, maxBins: Int, impurity: String)
  case class Eval(params: Params, auc: Double)
  case class SearchResult(best: Eval, evals: Seq[Eval],
      model: DecisionTreeClassificationModel)

  val evaluator: BinaryClassificationEvaluator =
    new BinaryClassificationEvaluator() // default metric: areaUnderROC

  def fitOne(train: DataFrame, p: Params, seed: Long): DecisionTreeClassificationModel =
    new DecisionTreeClassifier()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxDepth(p.maxDepth).setMaxBins(p.maxBins).setImpurity(p.impurity)
      .setSeed(seed)
      .fit(train)

  def auc(model: DecisionTreeClassificationModel, test: DataFrame): Double =
    evaluator.evaluate(model.transform(test))

  private val binsGrid = Seq(8, 16, 32, 64)

  private def uniformDraw(rnd: scala.util.Random): Params = Params(
    maxDepth = 2 + rnd.nextInt(24), // [2, 25]
    maxBins = binsGrid(rnd.nextInt(4)),
    impurity = Seq("gini", "entropy")(rnd.nextInt(2)))

  /** One seeded local move from the incumbent: jitter depth, step bins one
    * grid notch, or flip impurity.
    */
  private def mutate(rnd: scala.util.Random, p: Params): Params =
    rnd.nextInt(3) match {
      case 0 =>
        val d = p.maxDepth + (rnd.nextInt(7) - 3) // +-3
        p.copy(maxDepth = math.min(math.max(d, 2), 25))
      case 1 =>
        val i = binsGrid.indexOf(p.maxBins)
        val j = if (rnd.nextBoolean()) math.min(i + 1, 3) else math.max(i - 1, 0)
        p.copy(maxBins = binsGrid(j))
      case _ =>
        p.copy(impurity = if (p.impurity == "gini") "entropy" else "gini")
    }

  private def runSearch(
      train: DataFrame,
      test: DataFrame,
      evals: Int,
      seed: Long,
      runLog: Option[RunLog],
      propose: (scala.util.Random, Seq[Eval], Set[Params]) => Params
  ): SearchResult = {
    val rnd = new scala.util.Random(seed)
    val cachedTrain = train.cache()
    val cachedTest = test.cache()
    try {
      var results = Vector.empty[Eval]
      var seen = Set.empty[Params]
      while (results.length < evals) {
        val p = propose(rnd, results, seen)
        seen += p
        val m = fitOne(cachedTrain, p, seed)
        val a = auc(m, cachedTest)
        runLog.foreach(_.log(
          params = Map(
            "maxDepth" -> p.maxDepth.toString,
            "maxBins" -> p.maxBins.toString,
            "impurity" -> p.impurity),
          metrics = Map("area_under_ROC" -> a)))
        results :+= Eval(p, a)
      }
      val best = results.maxBy(r => (r.auc, -r.params.maxDepth))
      SearchResult(best, results, fitOne(cachedTrain, best.params, seed))
    } finally {
      cachedTrain.unpersist()
      cachedTest.unpersist()
    }
  }

  /** Adaptive explore/exploit search (the default): the first half of the
    * budget samples the space uniformly; the rest proposes seeded local
    * moves around the incumbent best (falling back to a fresh uniform draw
    * when the move lands on an already-evaluated point). The exploit tail
    * is what TPE buys the reference — concentrating late evals near the
    * posterior mode — without the surrogate machinery.
    */
  def search(
      train: DataFrame,
      test: DataFrame,
      evals: Int = 20,
      seed: Long = 42L,
      runLog: Option[RunLog] = None
  ): SearchResult = {
    val exploreBudget = math.max(evals / 2, math.min(3, evals))
    // every eval is a full distributed fit, so never spend one on a point
    // already evaluated (deterministic seed -> byte-identical model):
    // retry the proposal a few times, then fall back to uniform draws,
    // accepting a duplicate only if the 192-point space is near-exhausted
    def fresh(rnd: scala.util.Random, seen: Set[Params], first: => Params): Params = {
      val p0 = first
      if (!seen.contains(p0)) return p0
      var i = 0
      var p = p0
      while (seen.contains(p) && i < 32) { p = uniformDraw(rnd); i += 1 }
      p
    }
    runSearch(train, test, evals, seed, runLog, (rnd, sofar, seen) => {
      if (sofar.length < exploreBudget) {
        fresh(rnd, seen, uniformDraw(rnd))
      } else {
        val incumbent = sofar.maxBy(r => (r.auc, -r.params.maxDepth)).params
        fresh(rnd, seen, mutate(rnd, incumbent))
      }
    })
  }

  /** Pure seeded uniform random search — the baseline [[search]] is
    * measured against.
    */
  def searchRandom(
      train: DataFrame,
      test: DataFrame,
      evals: Int = 20,
      seed: Long = 42L,
      runLog: Option[RunLog] = None
  ): SearchResult =
    runSearch(train, test, evals, seed, runLog, (rnd, _, _) => uniformDraw(rnd))

  /** CONCURRENT seeded uniform search — the reference gestures at exactly
    * this (`SparkTrials`, 02-patient-trajectory.py:248): independent
    * trials are embarrassingly parallel, so N fits run as concurrent jobs
    * on the shared session via a fixed thread pool (each tagged into a
    * `graft-trials` scheduler pool — isolating under FAIR mode, plain
    * interleaving under FIFO). Determinism is preserved exactly:
    *   - the PROPOSAL stream is the same seeded draw as [[searchRandom]]
    *     (uniform proposals don't depend on earlier results, so
    *     parallelizing changes nothing about what gets evaluated);
    *   - every fit is seeded, so each trial's model/AUC is
    *     completion-order-independent;
    *   - results are collected in PROPOSAL order and the argmax runs over
    *     that ordered list — the winner ties break on proposal position,
    *     never on which thread finished first.
    * PipelineSpec pins best == searchRandom's best; the wall-time ratio
    * is printed by the spec for the record.
    */
  def searchParallel(
      train: DataFrame,
      test: DataFrame,
      evals: Int = 20,
      seed: Long = 42L,
      parallelism: Int = 4,
      runLog: Option[RunLog] = None
  ): SearchResult = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val rnd = new scala.util.Random(seed)
    val proposals = Vector.fill(evals)(uniformDraw(rnd)) // == searchRandom's stream
    withTrialPool(train, test, parallelism, seed) { (evalBatch, cachedTrain) =>
      val results = evalBatch(proposals)
      finish(results, cachedTrain, seed, runLog)
    }
  }

  /** The adaptive [[search]] strategy at [[searchParallel]]'s
    * throughput. The explore half's uniform draws are independent of
    * each other, so they run as ONE concurrent wave; the exploit tail
    * runs in GENERATIONS of `parallelism`: each generation proposes that
    * many distinct seeded local moves around the CURRENT incumbent,
    * evaluates them concurrently, and folds the results in proposal
    * order before the next generation re-reads the incumbent.
    *
    * Determinism is the [[searchParallel]] contract: the proposal stream
    * is a pure function of (seed, prior results), every fit is seeded,
    * and collection is proposal-ordered per wave — thread completion
    * order can't leak into proposals, AUCs, or the winner. The trade vs
    * the sequential [[search]] is incumbent freshness (a generation's
    * moves share one incumbent instead of updating after every eval)
    * for an ~parallelism× shorter critical path — the same trade
    * hyperopt's SparkTrials makes. PipelineSpec pins fixture quality
    * against the sequential search.
    */
  def searchAdaptiveParallel(
      train: DataFrame,
      test: DataFrame,
      evals: Int = 20,
      seed: Long = 42L,
      parallelism: Int = 4,
      runLog: Option[RunLog] = None
  ): SearchResult = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val rnd = new scala.util.Random(seed)
    val exploreBudget = math.max(evals / 2, math.min(3, evals))
    // n distinct unseen proposals (same retry-then-uniform fallback as
    // [[search]]: duplicates only when the 192-point space is nearly out)
    def freshBatch(n: Int, seen: Set[Params], first: () => Params): Vector[Params] = {
      var out = Vector.empty[Params]
      var s = seen
      while (out.length < n) {
        var p = first()
        var i = 0
        while (s.contains(p) && i < 32) { p = uniformDraw(rnd); i += 1 }
        out :+= p
        s += p
      }
      out
    }
    withTrialPool(train, test, parallelism, seed) { (evalBatch, cachedTrain) =>
      val explore = freshBatch(math.min(exploreBudget, evals), Set.empty,
        () => uniformDraw(rnd))
      var seen = explore.toSet
      var results = evalBatch(explore).toVector
      while (results.length < evals) {
        val incumbent = results.maxBy(r => (r.auc, -r.params.maxDepth)).params
        val gen = freshBatch(math.min(parallelism, evals - results.length), seen,
          () => mutate(rnd, incumbent))
        seen ++= gen
        results ++= evalBatch(gen)
      }
      finish(results, cachedTrain, seed, runLog)
    }
  }

  /** Shared fan-out plumbing: cache + materialize the split ONCE (so
    * concurrent trials don't race to compute the same cached
    * partitions), hand the body a proposal-ordered concurrent batch
    * evaluator running in the `graft-trials` scheduler pool, and tear
    * everything down after.
    */
  private def withTrialPool(
      train: DataFrame, test: DataFrame, parallelism: Int, seed: Long)(
      body: (Seq[Params] => Seq[Eval], DataFrame) => SearchResult): SearchResult = {
    val cachedTrain = train.cache()
    val cachedTest = test.cache()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      cachedTrain.count(): Unit
      cachedTest.count(): Unit
      val sc = train.sparkSession.sparkContext
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      def evalBatch(ps: Seq[Params]): Seq[Eval] = {
        val futures = ps.map { p =>
          scala.concurrent.Future {
            sc.setLocalProperty("spark.scheduler.pool", "graft-trials")
            val m = fitOne(cachedTrain, p, seed)
            Eval(p, auc(m, cachedTest))
          }
        }
        // collect in PROPOSAL order — completion order never leaks
        futures.map(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      }
      body(evalBatch, cachedTrain)
    } finally {
      pool.shutdown()
      cachedTrain.unpersist()
      cachedTest.unpersist(): Unit
    }
  }

  /** Proposal-ordered run-log writes, argmax, and the winning refit. */
  private def finish(
      results: Seq[Eval], cachedTrain: DataFrame, seed: Long,
      runLog: Option[RunLog]): SearchResult = {
    results.foreach { e =>
      runLog.foreach(_.log(
        params = Map(
          "maxDepth" -> e.params.maxDepth.toString,
          "maxBins" -> e.params.maxBins.toString,
          "impurity" -> e.params.impurity),
        metrics = Map("area_under_ROC" -> e.auc)))
    }
    val best = results.maxBy(r => (r.auc, -r.params.maxDepth))
    SearchResult(best, results.toVector, fitOne(cachedTrain, best.params, seed))
  }
}
