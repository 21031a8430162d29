package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two samples of a numeric
  * column — the Population Stability Index every recurring data /
  * training pipeline gates on (PSI < 0.1 stable, 0.1-0.2 moderate
  * shift, > 0.2 action). Combined with the lake's time travel this is
  * version-to-version drift: "did yesterday's load change the price
  * distribution?".
  *
  * Bins are FIXED-WIDTH from the baseline's own min/max — deliberately
  * not quantile bins: the edges are pure arithmetic over two broadcast
  * scalars, so any engine (and the DuckDB oracle) lands every value in
  * the identical bin, where percentile interpolation differs in ulps
  * and would flip edge values. Out-of-range current values clamp into
  * the terminal bins (the standard PSI treatment of new mass beyond the
  * baseline's support). NULLs (including values that fail the double
  * cast) get their OWN bin, `-1` on the axis: a null-rate shift is one
  * of the most common real drifts (an upstream field going dark), and
  * folding nulls into the totals while hiding them from the axis would
  * smear that signal into diffuse mass loss across every bin.
  * Proportions are Laplace-smoothed over the bins+1 categories —
  * (n+1)/(N+k+1) — so an empty bin contributes a finite, defined term
  * instead of ln(0).
  *
  * Scale shape: one aggregate pass per side (map-side partial combine,
  * bins-sized results), a 1-row baseline-stats broadcast, and joins on
  * the k-row bin axis. No driver actions, nothing grows with the table.
  */
object Drift {

  def psi(
      baseline: DataFrame, current: DataFrame,
      valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val spark = baseline.sparkSession
    val stats = baseline.agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def binned(df: DataFrame, nCol: String) = df
      .crossJoin(broadcast(stats))
      // null values (and failed casts) get their own -1 bin — via an
      // explicit null test: greatest/least SKIP nulls (both engines), so
      // a null value would otherwise clamp silently into bin 0
      .select(when(col(valueCol).cast("double").isNull, lit(-1))
        .otherwise(least(greatest(floor(
          (col(valueCol).cast("double") - col("__lo")) /
            greatest((col("__hi") - col("__lo")) / bins, lit(1e-12))),
          lit(0.0)), lit((bins - 1).toDouble)).cast("int")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(nCol))
    val a = binned(baseline, "n_base")
    val b = binned(current, "n_cur")
    val ta = a.agg(sum(col("n_base")).as("__t_base"))
    val tb = b.agg(sum(col("n_cur")).as("__t_cur"))
    val axis = spark.range(-1, bins).select(col("id").cast("int").as("bin"))
    val k = lit((bins + 1).toDouble) // bins + the null bin
    val pBase = (col("n_base") + lit(1.0)) / (col("__t_base") + k)
    val pCur = (col("n_cur") + lit(1.0)) / (col("__t_cur") + k)
    axis
      .join(a, Seq("bin"), "left").join(b, Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(
        col("bin"),
        col("n_base"),
        col("n_cur"),
        round((pCur - pBase) * log(pCur / pBase), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** [[psi]] stratified by a group column — per-segment drift, the form
    * dashboards actually page on ("only the URGENT tier moved"). Bin
    * edges come from EACH GROUP's own baseline min/max (a groups-sized
    * stats table, broadcast), so a group's score reflects its own
    * distribution, not the global one. Groups absent from the baseline
    * have no defined PSI and are excluded — monitor them with a
    * presence check, not a drift score.
    */
  def psiByGroup(
      baseline: DataFrame, current: DataFrame,
      groupCol: String, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val spark = baseline.sparkSession
    val stats = baseline.groupBy(col(groupCol)).agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def binned(df: DataFrame, nCol: String) = df
      .join(broadcast(stats), Seq(groupCol))
      // null values (and failed casts) get their own -1 bin — via an
      // explicit null test: greatest/least SKIP nulls (both engines), so
      // a null value would otherwise clamp silently into bin 0
      .select(col(groupCol), when(col(valueCol).cast("double").isNull, lit(-1))
        .otherwise(least(greatest(floor(
          (col(valueCol).cast("double") - col("__lo")) /
            greatest((col("__hi") - col("__lo")) / bins, lit(1e-12))),
          lit(0.0)), lit((bins - 1).toDouble)).cast("int")).as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as(nCol))
    val a = binned(baseline, "n_base")
    val b = binned(current, "n_cur")
    val ta = a.groupBy(col(groupCol)).agg(sum(col("n_base")).as("__t_base"))
    val tb = b.groupBy(col(groupCol)).agg(sum(col("n_cur")).as("__t_cur"))
    val axis = stats.select(col(groupCol))
      .crossJoin(spark.range(-1, bins).select(col("id").cast("int").as("bin")))
    val k = lit((bins + 1).toDouble) // bins + the null bin
    val pBase = (col("n_base") + lit(1.0)) / (col("__t_base") + k)
    val pCur = (col("n_cur") + lit(1.0)) / (col("__t_cur") + k)
    axis
      .join(a, Seq(groupCol, "bin"), "left").join(b, Seq(groupCol, "bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .join(broadcast(ta), Seq(groupCol)).join(broadcast(tb), Seq(groupCol), "left")
      .na.fill(0L, Seq("__t_cur"))
      .select(
        col(groupCol),
        col("bin"),
        col("n_base"),
        col("n_cur"),
        round((pCur - pBase) * log(pCur / pBase), 6).as("psi_term"))
      .orderBy(col(groupCol), col("bin"))
  }

  /** EMBEDDING drift between two corpus versions, per group: how far
    * each group's centroid moved (cosine between the two centroids and
    * the L2 shift), beside the raw counts. PSI watches one scalar
    * column; an embedding corpus drifts in vector space — a re-run
    * encoder, a deleted subpopulation, or an upstream language shift
    * moves centroids long before any scalar column notices. The standard
    * SemDeDup/model-ops gate: centroid_cos near 1 = stable; a falling
    * cosine or growing shift on one label = that slice changed.
    *
    * Scale shape: one [[graft.functions.VectorMean]] aggregate pass per
    * side (map-side partial combine, one row per group out) and a
    * groups-sized join — the corpus is never joined row-to-row, nothing
    * reaches the driver.
    */
  def embeddingDrift(
      baseline: DataFrame, current: DataFrame,
      groupCol: String, vecCol: String): DataFrame = {
    def side(df: DataFrame, n: String, c: String) = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as(n),
        graft.functions.VectorMean(col(vecCol)).as(c))
    // FULL OUTER on the group key: deleted groups surface with n_cur = 0
    // and brand-new groups (a re-run encoder's new label, a new corpus
    // slice) with n_base = 0 — both are drift a gate must see, and a
    // one-sided join would silently hide whichever side it drops. The
    // missing side's centroid is NULL, so the cosine/shift metrics are
    // NULL (there is nothing to compare against), while the counts tell
    // the story.
    side(baseline, "n_base", "__cb")
      .join(side(current, "n_cur", "__cc"), Seq(groupCol), "full")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .select(
        col(groupCol),
        col("n_base"),
        col("n_cur"),
        round(graft.functions.VectorFunctions.cosineSim(col("__cb"), col("__cc")), 6)
          .as("centroid_cos"),
        round(graft.functions.VectorFunctions.euclidean(col("__cb"), col("__cc")), 6)
          .as("centroid_shift"))
      .orderBy(col(groupCol))
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map.empty
  def oracles: Map[String, String] = Map.empty
}
