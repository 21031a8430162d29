package graft.text

import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.Trainer

/** Model-based document quality filtering — the fastText-classifier step
  * of CCNet/LLaMA-style pipelines, built entirely from in-engine pieces:
  * cheap per-doc statistics are the features, the (expensive, heuristic)
  * Gopher rule verdict is the WEAK LABEL, and a seeded decision tree
  * learns to reproduce it. The trained model then scores documents from
  * the cheap features alone — at 100 TB the rules that needed shingling
  * and regex passes collapse into one map-only model.transform.
  *
  * Every step is seeded: same corpus → same tree → same scores.
  */
object QualityClassifier {

  /** Cheap, map-only per-doc features (no shingling, no joins). */
  def featurize(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nWords = size(toks).cast("double")
    docs.select(
      col("doc_id"),
      array(
        nWords,
        length(col("text")).cast("double"),
        // mean word length
        length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          greatest(nWords, lit(1.0)),
        TextFunctions.punctRatio(col("text")),
        // distinct-token ratio (cheap repetition signal)
        size(array_distinct(toks)).cast("double") / greatest(nWords, lit(1.0))
      ).as("raw_features"))
  }

  /** Weak label from the Gopher rule verdict (pass_all as 0/1). */
  def weakLabels(spark: SparkSession, sfDir: String): DataFrame =
    TextQueries.gopherQuality(spark, sfDir)
      .select(col("doc_id"), col("pass_all").cast("double").as("label"))

  final case class Trained(
      model: DecisionTreeClassificationModel,
      trainAuc: Double)

  /** Fit the classifier on the weak labels (seeded, fixed params — the
    * point is distillation, not search).
    */
  def train(spark: SparkSession, sfDir: String, seed: Long = 42L): Trained = {
    val docs = Tables(spark, sfDir).documents
    val data = featurize(docs)
      .join(weakLabels(spark, sfDir), Seq("doc_id"))
      .select(array_to_vector(col("raw_features")).as("features"), col("label"))
      .cache()
    try {
      // a single-class weak label trains a tree with numClasses=1 whose
      // probability vector has length 1, so score()'s element_at(.., 2)
      // would come back silently NULL for every document — fail loudly
      val classes = data.select(col("label")).distinct()
        .collect().map(_.getDouble(0)).sorted
      require(classes.sameElements(Array(0.0, 1.0)),
        s"distillation needs both label classes; Gopher verdict is " +
          s"single-class (${classes.mkString(",")}) on this corpus — " +
          "relax the rules or use a corpus with both outcomes")
      val model = Trainer.fitOne(data,
        Trainer.Params(maxDepth = 5, maxBins = 32, impurity = "gini"), seed)
      Trained(model, Trainer.auc(model, data))
    } finally { data.unpersist(); () }
  }

  /** Score documents with a trained model: map-only (featurize +
    * transform), returns (doc_id, quality_prob).
    */
  def score(docs: DataFrame, trained: Trained): DataFrame =
    score(docs, trained.model)

  /** Score with a bare model — the STANDING-model path: at scale the
    * tree is promoted once ([[graft.ml.ModelRegistry.promote]]) and every scoring
    * job is load + this map-only transform, no re-distillation.
    */
  def score(docs: DataFrame, model: DecisionTreeClassificationModel): DataFrame = {
    val feats = featurize(docs)
      .select(col("doc_id"), array_to_vector(col("raw_features")).as("features"))
    model.transform(feats)
      .select(col("doc_id"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("quality_prob"))
  }

  /** The fitted tree COMPILED TO SQL — the "inline the learned artifact"
    * oracle trick (q_embedding_neardup's plane constants, q_simhash's
    * md5-60 signature) generalized to a MODEL: every split is a nested
    * CASE on the feature columns `f0..f4`, every leaf is its class-1
    * probability (MLlib's `probability` output is exactly the leaf's
    * normalized class counts), and the thresholds round-trip through
    * Double.toString into a correctly-rounded parser. Because the five
    * features are the engine-parity arithmetic the Gopher oracle already
    * proved (token split, length ratios, the 6dp-rounded punct ratio),
    * DuckDB recomputing features + walking the same constants yields the
    * same scores — the distilled model itself becomes content-checked,
    * not just spec-pinned.
    */
  def treeToSql(model: DecisionTreeClassificationModel): String = {
    def emit(n: org.apache.spark.ml.tree.Node): String = n match {
      case i: org.apache.spark.ml.tree.InternalNode =>
        val s = i.split match {
          case c: org.apache.spark.ml.tree.ContinuousSplit => c
          case other => throw new IllegalStateException(
            s"quality tree has a non-continuous split: $other")
        }
        s"(CASE WHEN f${s.featureIndex} <= ${s.threshold} " +
          s"THEN ${emit(i.leftChild)} ELSE ${emit(i.rightChild)} END)"
      case l: org.apache.spark.ml.tree.LeafNode =>
        val counts = org.apache.spark.ml.GraftMlBridge.leafClassCounts(l)
        val total = counts.sum
        val p = if (total == 0.0) 0.0 else counts(1) / total
        p.toString
    }
    emit(model.rootNode)
  }

  /** DuckDB oracle for [[score]]'s output over the `documents` table:
    * recompute the five [[featurize]] features engine-neutrally, then
    * walk the inlined tree ([[treeToSql]]). Generated at Verify time
    * (the tree is corpus-dependent, so this cannot be a static string).
    */
  def scoreOracleSql(model: DecisionTreeClassificationModel): String = {
    val toks = """string_split_regex(trim(lower(text)), '\s+')"""
    s"""WITH f AS (
       |  SELECT doc_id,
       |    len($toks)::DOUBLE AS f0,
       |    length(text)::DOUBLE AS f1,
       |    length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
       |      / greatest(len($toks)::DOUBLE, 1.0) AS f2,
       |    round(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE
       |      / greatest(length(text), 1), 6) AS f3,
       |    len(list_distinct($toks))::DOUBLE
       |      / greatest(len($toks)::DOUBLE, 1.0) AS f4
       |  FROM documents)
       |SELECT doc_id, round(${treeToSql(model)}, 6) AS quality_prob
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
