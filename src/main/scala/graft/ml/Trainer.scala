package graft.ml

import org.apache.spark.ml.classification.{DecisionTreeClassificationModel, DecisionTreeClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame

/** Decision-tree training with seeded hyperparameter search (SURVEY §2
  * K3/K4/K6).
  *
  * The reference searches with hyperopt TPE, 20 evals over
  * {max_depth ∈ [2,25], max_bins ∈ {8,16,32,64}, impurity ∈ {gini,entropy}}
  * (02-patient-trajectory.py:236-259). No hyperopt on the JVM: the same
  * contract (argmax AUC over 20 draws from that space) with a seeded
  * uniform sampler — deterministic and dependency-free. Each eval is a
  * distributed fit; the loop itself is driver-side exactly like the
  * reference's Trials loop.
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

  /** Seeded random search, 20 evals (the reference's budget). */
  def search(
      train: DataFrame,
      test: DataFrame,
      evals: Int = 20,
      seed: Long = 42L,
      runLog: Option[RunLog] = None
  ): SearchResult = {
    val rnd = new scala.util.Random(seed)
    val draws = Seq.fill(evals)(Params(
      maxDepth = 2 + rnd.nextInt(24), // [2, 25]
      maxBins = Seq(8, 16, 32, 64)(rnd.nextInt(4)),
      impurity = Seq("gini", "entropy")(rnd.nextInt(2))))
    val cachedTrain = train.cache()
    val cachedTest = test.cache()
    try {
      val results = draws.map { p =>
        val m = fitOne(cachedTrain, p, seed)
        val a = auc(m, cachedTest)
        runLog.foreach(_.log(
          params = Map(
            "maxDepth" -> p.maxDepth.toString,
            "maxBins" -> p.maxBins.toString,
            "impurity" -> p.impurity),
          metrics = Map("area_under_ROC" -> a)))
        Eval(p, a)
      }
      val best = results.maxBy(r => (r.auc, -r.params.maxDepth))
      SearchResult(best, results, fitOne(cachedTrain, best.params, seed))
    } finally {
      cachedTrain.unpersist()
      cachedTest.unpersist()
    }
  }
}
