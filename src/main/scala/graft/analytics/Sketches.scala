package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch-based distinct counting (Apache DataSketches HLL via Spark's
  * built-in `hll_sketch_agg` family) — the 100 TB path for COUNT DISTINCT.
  *
  * Exact distinct shuffles every distinct key; an HLL sketch shuffles a
  * fixed ~2^lgK-byte state per group regardless of cardinality, and —
  * unlike `approx_count_distinct`'s opaque internal state — the sketch is
  * a first-class binary value: partial sketches persist to a lake table
  * and MERGE across days/partitions without re-scanning history
  * (`hll_union_agg`). Mergeability is pinned in SketchesSpec; the
  * declared query pins the estimate's error bound as an oracle-matched
  * boolean (the estimate itself is engine-specific by design).
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  /** Per-status distinct customers: exact count next to the HLL estimate,
    * with the relative error folded into a deterministic boolean so the
    * whole row is oracle-comparable. lgConfigK=14 (16 KiB state) gives
    * ~0.8% RSD — 2% is a conservative pin.
    */
  def hllDistinctCustomers(spark: SparkSession, sfDir: String): DataFrame =
    // NOT spread: the sketch partial is cheap per row, and the 3-pass
    // bench showed the round-robin exchange costing more than the
    // parallelism buys (0.97 -> 1.22 s with the spread; r16's claimed
    // win came from a 1-pass meter in a colder regime). At real scale
    // the scan arrives multi-partition anyway.
    Tables(spark, sfDir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))).as("approx")
      )
      .select(
        col("o_orderstatus"),
        col("n_exact"),
        (abs(col("approx") - col("n_exact")) <= col("n_exact") * lit(0.02))
          .as("within_2pct")
      )
      .orderBy(col("o_orderstatus"))

  /** Partial sketches per group, merged to a global estimate — the
    * incremental-rollup shape: day-level sketches union into month totals
    * without touching the raw data again.
    */
  def hllUnionEstimate(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(keyCol), lit(14)).as("sketch"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("approx_total"))

  /** Heavy-hitter tokens via the custom Misra–Gries aggregate
    * ([[graft.functions.FrequentItems]]): the sketch carries at most k=64
    * counters through the shuffle however many distinct tokens exist.
    * The oracle-comparable part is the GUARANTEE, not the estimates:
    * every token with true frequency > N/65 must be in the summary, and
    * the exact top-10 all clear that bar at every test SF — so
    * `found` is deterministically true however the input is partitioned,
    * while the (order-dependent) estimated counts stay out of the row.
    */
  def heavyHitterTokens(spark: SparkSession, sfDir: String): DataFrame = {
    // NOT spread: tokenization here feeds a 64-counter sketch and a
    // top-10 aggregate — light enough that the 3-pass bench showed the
    // exchange as a pure loss (0.38 -> 0.65 s spread)
    val toks = Tables(spark, sfDir).documents
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val sketch = toks.agg(
      graft.functions.FrequentItems(col("tok"), 64).as("hh"))
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10)
      .crossJoin(broadcast(sketch))
      .select(col("tok"), col("n"),
        array_contains(col("hh.item"), col("tok")).as("found"))
      .orderBy(col("n").desc, col("tok").asc)
  }

  /** The per-group shape of the sketch — one bounded summary per
    * language stream, the way corpus monitoring actually runs (top
    * tokens per slice, per day, per source). The guarantee bar is
    * per-group (N_lang/65); the exact per-lang top-3 clear it with >2x
    * margin at every test SF, so `found` is deterministic.
    */
  def heavyHittersByGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT spread: same 3-pass verdict as heavyHitterTokens
    // (0.54 -> 1.01 s with the spread)
    val toks = Tables(spark, sfDir).documents
      .select(col("lang"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val sketches = toks.groupBy(col("lang"))
      .agg(graft.functions.FrequentItems(col("tok"), 64).as("hh"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok").asc)
    toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
      .join(sketches, "lang")
      .select(col("lang"), col("tok"), col("cnt"),
        array_contains(col("hh.item"), col("tok")).as("found"))
      .orderBy(col("lang"), col("cnt").desc, col("tok"))
  }

  /** Mergeable t-digest quantiles ([[graft.functions.TDigest]]) next to
    * the exact values, with the estimate folded into a RANK-band boolean:
    * the digest's guarantee is rank error (≤ 4·q(1-q)/δ = 1% at the
    * median for δ=100), so the check is "estimate lies between the exact
    * values at q ± band", which is deterministic however the input is
    * partitioned. Union-of-partials == one-big-digest is pinned in
    * TDigestSpec; this row pins the single-pass accuracy contract.
    */
  def tdigestQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TDigest
    // spread: the exact percentiles sort per group and the digest
    // partials are CPU-bound; the band booleans are partition-robust
    Tables.spreadScan(Tables(spark, sfDir).orders)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        expr("percentile(o_totalprice, 0.46)").as("__p46"),
        expr("percentile(o_totalprice, 0.54)").as("__p54"),
        expr("percentile(o_totalprice, 0.984)").as("__p984"),
        expr("percentile(o_totalprice, 0.996)").as("__p996"),
        TDigest.agg(col("o_totalprice"), 100).as("__sk"))
      .select(
        col("o_orderstatus"), col("p50"), col("p99"),
        TDigest.quantileCol(col("__sk"), 0.5)
          .between(col("__p46"), col("__p54")).as("p50_in_band"),
        TDigest.quantileCol(col("__sk"), 0.99)
          .between(col("__p984"), col("__p996")).as("p99_in_band"))
      .orderBy(col("o_orderstatus"))
  }

  /** KMV/theta set operations ([[graft.functions.KmvSketch]]): distinct
    * customers per order-status segment AND their INTERSECTION, estimated
    * from two kilobyte sketches — the query HLL cannot answer (union-only)
    * without a distinct-join over raw history. Exact values ride along;
    * the estimates fold into error-bound booleans (k=1024 → ~3% RSD on
    * sizes; the intersection inherits ~1/sqrt(k·overlap), 10% is a
    * conservative pin at every test SF).
    */
  def kmvSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.KmvSketch
    val orders = Tables(spark, sfDir).orders
    def seg(status: String) =
      orders.where(col("o_orderstatus") === status)
        .agg(
          countDistinct(col("o_custkey")).as(s"n_$status"),
          KmvSketch.agg(col("o_custkey"), 1024).as(s"sk_$status"))
    val both = orders.where(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
      .intersect(orders.where(col("o_orderstatus") === "O")
        .select(col("o_custkey")).distinct())
      .agg(count(lit(1)).as("n_both"))
    seg("F").crossJoin(seg("O")).crossJoin(both)
      .select(
        col("n_F"), col("n_O"), col("n_both"),
        (abs(KmvSketch.estimateCol(col("sk_F")) - col("n_F")) <=
          col("n_F") * 0.05).as("f_within_5pct"),
        (abs(KmvSketch.estimateCol(col("sk_O")) - col("n_O")) <=
          col("n_O") * 0.05).as("o_within_5pct"),
        (abs(KmvSketch.intersectCol(col("sk_F"), col("sk_O")) - col("n_both")) <=
          col("n_both") * 0.10).as("both_within_10pct"))
  }

  /** Count-Min point frequencies ([[graft.functions.CountMinSketch]]):
    * the third sketch pillar — HLL counts distinct, KMV does set ops,
    * the CMS answers "how often does THIS key occur" from kilobytes.
    * Per-returnflag sketches are merged back through `cms_merge_agg`
    * (additive counters — the daily-sketch reaggregation shape; byte
    * identity of merged vs global build pinned in CountMinSketchSpec),
    * then the top-20 part keys' estimates are checked against their
    * exact counts: never below (one-sided guarantee), and above by at
    * most 8N/width — loose enough that the failure probability per key
    * is ~(1/8)^depth, tight enough that a broken hash or merge breaks
    * the boolean.
    */
  def cmsPointCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.CountMinSketch
    val li = Tables(spark, sfDir).lineitem
    val merged = li.groupBy(col("l_returnflag"))
      .agg(CountMinSketch.agg(col("l_partkey").cast("string")).as("sk"))
      .agg(CountMinSketch.mergeAgg(col("sk")).as("sk"))
    val total = li.agg(count(lit(1)).as("total"))
    val est = CountMinSketch.estimateCol(col("sk"), col("l_partkey").cast("string"))
    li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey")).limit(20)
      .crossJoin(broadcast(merged)).crossJoin(broadcast(total))
      .select(col("l_partkey"), col("n"),
        (est >= col("n") &&
          est <= col("n") + ceil(col("total") * 8.0 / 8192).cast("long"))
          .as("cms_ok"))
      .orderBy(col("n").desc, col("l_partkey"))
  }

  def queries: Map[String, Q] = Map(
    "q_hll_distinct" -> (hllDistinctCustomers _),
    "q_tdigest_quantiles" -> (tdigestQuantiles _),
    "q_kmv_set_ops" -> (kmvSetOps _),
    "q_cms_counts" -> (cmsPointCounts _),
    "q_heavy_hitters" -> (heavyHitterTokens _),
    "q_heavy_hitters_by_group" -> (heavyHittersByGroup _)
  )

  def oracles: Map[String, String] = Map(
    "q_cms_counts" ->
      """SELECT l_partkey, n, true AS cms_ok FROM (
        |  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
        |  ORDER BY n DESC, l_partkey LIMIT 20)
        |ORDER BY n DESC, l_partkey""".stripMargin,
    "q_kmv_set_ops" ->
      """SELECT
        | (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderstatus = 'F') AS n_F,
        | (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderstatus = 'O') AS n_O,
        | (SELECT count(*) FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |    INTERSECT
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS n_both,
        | true AS f_within_5pct, true AS o_within_5pct, true AS both_within_10pct""".stripMargin,
    "q_tdigest_quantiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        | true AS p50_in_band, true AS p99_in_band
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_hll_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_exact,
        | true AS within_2pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT tok, count(*) AS n, true AS found
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 10""".stripMargin,
    "q_heavy_hitters_by_group" ->
      """WITH e AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |           FROM documents)
        |SELECT lang, tok, cnt, true AS found FROM (
        |  SELECT lang, tok, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok) AS rn
        |  FROM e GROUP BY lang, tok)
        |WHERE rn <= 3 ORDER BY lang, cnt DESC, tok""".stripMargin
  )
}
