package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The 100 TB scale utilities exposed as ORACLED queries — each one runs
  * a scale technique (skew salting, bucketed co-location, deterministic
  * sampling) end-to-end and hash-matches a plain-SQL reconstruction, so
  * the techniques are verified to be RESULT-PRESERVING, not just fast.
  * Plan-shape guarantees (no exchange on the bucketed join, salt spread)
  * stay pinned in ScaleOpsSpec/SkewSpec; this surface pins the values.
  */
object ScaleSurface {

  type Q = (SparkSession, String) => DataFrame

  /** Skew-salted fact×dim join, then revenue rollup. The salt spreads
    * every hot l_partkey over 8 reducers (dim replicated 8×, fact salted
    * deterministically); the aggregate collapses the salt away, so the
    * result must equal the unsalted join — which is exactly what the
    * DuckDB oracle computes.
    */
  def skewSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    Skew.saltedJoin(t.lineitem, t.part, "l_partkey", "p_partkey", saltFactor = 8)
      .groupBy(col("p_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("p_type"))
  }

  /** Join two bucket-co-located tables on their bucket key. Writing both
    * sides bucketed by the join key (`bucketBy` + `sortBy`, the batch
    * analogue of a co-partitioned 100 TB layout) lets the sort-merge join
    * run with NO shuffle exchange on either side (ScaleOpsSpec pins the
    * exchange-free plan); here the joined values themselves are oracled.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    // table names are unique PER JVM: the driver's Verify (sf0.01) and
    // Bench (sf0.1) runs can overlap in time from the same cwd, and two
    // JVMs sharing a warehouse location race each other's delete/create
    // on the bucket dirs (observed: one -1 bench failure that never
    // reproduces in isolation). The in-memory catalog is per-JVM already;
    // the suffix makes the warehouse DIRECTORIES per-JVM too.
    val tag = java.lang.ProcessHandle.current().pid()
    val liTbl = s"graft_bkt_lineitem_$tag"
    val ordTbl = s"graft_bkt_orders_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $liTbl")
    spark.sql(s"DROP TABLE IF EXISTS $ordTbl")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS; clear the stale locations explicitly
    // (a recycled pid could still collide with debris from a dead JVM)
    val wh = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(liTbl, ordTbl).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(wh, n), true)
    }
    // repartition by the bucket key INTO the bucket count before the
    // bucketed write: Spark's bucket assignment is the same
    // Murmur3-pmod hash as HashPartitioning, so each write task holds
    // exactly one bucket — one file per bucket (instead of one file per
    // (input-partition × bucket)) and the sort+write parallelizes
    // across the buckets rather than serializing on the scan's split
    // count. Keyed by the join key, sized by the table's bucket spec —
    // nothing here depends on the local core count.
    t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
      .repartition(8, col("l_orderkey"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(liTbl)
    t.orders.select("o_orderkey", "o_orderpriority")
      .repartition(8, col("o_orderkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ordTbl)
    spark.table(liTbl)
      .join(spark.table(ordTbl),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Deterministic stratified corpus sample ([[Sampling.deterministicStratified]]):
    * per-language keep rates, row-pure md5 uniform — the exact selected
    * rows (not just counts) hash-match the oracle, proving the sampler is
    * partition-independent.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.deterministicStratified(
      Tables(spark, sfDir).documents,
      stratumCol = "lang", idCol = "doc_id",
      fractions = Map("en" -> 0.25, "de" -> 0.6, "es" -> 0.5, "fr" -> 1.0, "zh" -> 0.1))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Weighted sample without replacement ([[Sampling.weightedSample]],
    * Efraimidis–Spirakis A-Res): 50 orders drawn with probability
    * proportional to o_totalprice. The md5-derived uniform makes the
    * drawn SET a pure function of the keys, so the oracle recomputes the
    * identical sample in SQL — the result is the exact rows, not a
    * statistic.
    */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.weightedSample(
      Tables(spark, sfDir).orders, idCol = "o_orderkey",
      weightCol = "o_totalprice", k = 50)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Per-language weighted sample ([[Sampling.weightedSamplePerGroup]]):
    * 5 docs per lang, inclusion proportional to n_chars — the
    * quality-weighted per-stratum corpus selection, oracle-exact via the
    * identical SQL window.
    */
  def weightedSampleByLang(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.weightedSamplePerGroup(
      Tables(spark, sfDir).documents, groupCol = "lang", idCol = "doc_id",
      weightCol = "n_chars", k = 5)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("doc_id"))

  def queries: Map[String, Q] = Map(
    "q_skew_salted_join" -> (skewSaltedJoin _),
    "q_bucketed_join" -> (bucketedJoin _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_weighted_sample" -> (weightedSample _),
    "q_weighted_sample_group" -> (weightedSampleByLang _)
  )

  def oracles: Map[String, String] = Map(
    "q_skew_salted_join" ->
      """SELECT p_type, count(*) AS n,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents d
        |JOIN (VALUES ('en', 0.25), ('de', 0.6), ('es', 0.5), ('fr', 1.0), ('zh', 0.1))
        |  f(s, frac) ON d.lang = f.s
        |WHERE (('0x' || substring(md5(d.doc_id::VARCHAR), 1, 8))::UBIGINT
        |       / 4294967296.0) < f.frac
        |ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    -ln((('0x' || substring(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT + 1.0)
        |        / 4294967296.0) / o_totalprice AS k
        |  FROM orders WHERE o_totalprice > 0
        |  ORDER BY k, o_orderkey LIMIT 50)
        |ORDER BY o_orderkey""".stripMargin,
    "q_weighted_sample_group" ->
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      -ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT + 1.0)
        |          / 4294967296.0) / n_chars, doc_id) AS rn
        |  FROM documents WHERE n_chars > 0)
        |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin
  )
}
