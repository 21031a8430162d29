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

  case class ModelRef(name: String, stage: String, version: String)

  /** Score `df` with the registered model and stamp provenance columns. */
  def scoreWithMetadata(
      registry: ModelRegistry,
      ref: ModelRef,
      df: DataFrame
  ): DataFrame = {
    val model = registry.loadDecisionTree(ref.name, ref.stage)
    model.transform(df)
      .withColumn("model_name", lit(ref.name))
      .withColumn("model_version", lit(ref.version))
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
