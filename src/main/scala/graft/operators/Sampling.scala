package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators for training-data balancing (seeded, so pipelines
  * are reproducible — SURVEY §5.2 determinism rule J3 applied to the
  * sampling surface).
  */
object Sampling {

  /** Stratified sample: per-stratum fractions (df.stat.sampleBy). */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[Any, Double],
      seed: Long
  ): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Downsample every stratum to (at most) the size of the smallest one —
    * class balancing without driver-side loops: compute per-stratum counts
    * (tiny), derive fractions, one sampleBy pass.
    */
  def balanced(df: DataFrame, stratumCol: String, seed: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df // empty input -> empty sample, not a crash
    val minN = counts.values.min.toDouble
    val fractions = counts.map { case (k, n) => k -> math.min(1.0, minN / n) }
    df.stat.sampleBy(stratumCol, fractions, seed)
  }
}
