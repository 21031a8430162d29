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

  /** Deterministic, ORACLE-EXACT stratified sample. `sampleBy` is seeded
    * but partition-order-dependent (each task advances its own RNG), so
    * two runs over differently-partitioned input keep different rows.
    * Here the keep decision is a pure function of the ROW — uniform in
    * [0,1) from the first 8 md5 hex digits of its id — so the sample is
    * identical across partitionings, engines, and reruns (the property
    * the temperature mixer already relies on, generalized to an
    * arbitrary per-stratum rate map). Rates ride a broadcast join: no
    * driver-side loop, no shuffle of the big side.
    */
  def deterministicStratified(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fractions: Map[String, Double]
  ): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val fr = fractions.toSeq.toDF("__stratum", "__frac")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint").cast("double") / lit(4294967296.0)
    df.join(broadcast(fr), col(stratumCol) === col("__stratum"))
      .where(u < col("__frac"))
      .drop("__stratum", "__frac")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    * IPL — the A-Res scheme): each row draws an exponential key
    * -ln(u)/w (equivalent to ranking u^(1/w) descending) and the k
    * SMALLEST keys win, giving inclusion probability proportional to
    * weight without replacement — the mixture-sampling primitive for
    * quality-weighted corpus selection. `u` is the same md5-derived
    * uniform the deterministic stratified sampler uses, so the drawn
    * SET is a pure function of row ids: identical across partitionings,
    * reruns, and ENGINES (the oracle recomputes the same sample in
    * SQL). One global sort-limit (TakeOrderedAndProject — k rows per
    * partition then k at the driver, never a full sort) is the entire
    * cost; weights must be strictly positive.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    // uniform in (0, 1]: md5-derived like the stratified sampler, +1 so
    // an all-zero hash prefix cannot make -ln(u) infinite (textbook
    // A-Res draws from (0, 1])
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint").cast("double") + 1.0) / lit(4294967296.0)
    df.where(col(weightCol) > 0)
      .withColumn("__ares_key", -log(u) / col(weightCol))
      // id tiebreak: two rows sharing an md5 prefix AND a weight would
      // otherwise order nondeterministically at the k boundary
      .orderBy(col("__ares_key"), col(idCol))
      .limit(k)
      .drop("__ares_key")
  }

  /** Per-stratum [[weightedSample]]: k rows PER GROUP, inclusion still
    * proportional to weight within the group — the per-language
    * quality-weighted corpus selection primitive. One window over the
    * group key ordered by the same deterministic A-Res key (no per-group
    * loop, no driver state); the oracle recomputes the identical sample
    * with the identical SQL window.
    */
  def weightedSamplePerGroup(
      df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint").cast("double") + 1.0) / lit(4294967296.0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__ares_key"), col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("__ares_key", -log(u) / col(weightCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__ares_key", "__rn")
  }

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
