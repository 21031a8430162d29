package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model scoring with provenance stamping (SURVEY §2 K5 + B7/B14).
  *
  * Reference shape: load the Production model, transform the full patient
  * table, and stamp every scored row with model name/version/source and
  * the scoring timestamp (03-work with ML models.py:110-152).
  */
object Scorer {

  case class ModelRef(name: String, stage: String)

  /** Score `df` with the registered model and stamp provenance columns.
    * The version is READ FROM THE REGISTRY (bumped at promote time), not
    * asserted by the caller — a caller-supplied version could silently
    * disagree with the artifact actually loaded.
    */
  def scoreWithMetadata(
      registry: ModelRegistry,
      ref: ModelRef,
      df: DataFrame
  ): DataFrame = {
    val model = registry.loadDecisionTree(ref.name, ref.stage)
    val version = registry.currentVersion(ref.name, ref.stage)
    model.transform(df)
      .withColumn("model_name", lit(ref.name))
      .withColumn("model_version", lit(version))
      .withColumn("model_stage", lit(ref.stage))
      .withColumn("scored_at", current_timestamp())
  }

  /** Prediction breakdown by demographic columns (03:119-121). */
  def predictionBreakdown(scored: DataFrame, dims: Seq[String]): DataFrame =
    scored
      .where(col("prediction") === 1)
      .groupBy(dims.map(col) :+ col("prediction"): _*)
      .agg(count(lit(1)).as("count"))
      .orderBy(dims.map(col): _*)
}
