package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end training-corpus preparation — the composed pipeline a
  * 100 TB pretraining-data job runs, built entirely from the engine's own
  * operators:
  *
  *   1. language + length gates (cheap pushdown-able filters first);
  *   2. exact dedup (md5 hash, deterministic min-id survivor);
  *   3. near-dup removal: exact n-gram Jaccard pairs >= threshold via the
  *      inverted-index join, dropping the higher doc_id of each pair;
  *   4. quality-score gate.
  *
  * Order matters at scale: each stage shrinks the input of the next, and
  * the only super-linear stage (near-dup) runs after exact dedup has
  * already removed identical copies. Every stage is deterministic, so the
  * whole pipeline is oracle-matched end to end (q_training_corpus).
  */
object TrainingData {

  case class Config(
      lang: Option[String] = Some("en"),
      minChars: Long = 100L,
      maxChars: Long = 10000L,
      nearDupNgram: Int = 3,
      nearDupThreshold: Double = 0.8,
      minQuality: Double = 0.5)

  /** Surviving documents with their quality score. */
  def prepare(docs: DataFrame, cfg: Config): DataFrame = {
    val gated = cfg.lang.fold(docs)(l => docs.where(col("lang") === l))
      .where(col("n_chars").between(cfg.minChars, cfg.maxChars))
    // cache the exact-dedup stage: it feeds BOTH the near-dup pair
    // generation and the left_anti survivor branch — without this the
    // window-dedup subplan (scan + shuffle + sort) runs twice per job.
    // MEMORY_AND_DISK (the DF default) spills rather than OOMs at scale.
    // Lifetime note: the entry lives until session end (Spark's cache
    // manager dedupes by plan, so repeated calls over the same input reuse
    // one entry); a long-lived service cycling many corpora should
    // unpersist via spark.catalog.clearCache() between jobs.
    val exact = Dedup.exact(gated, "text", "doc_id").cache()
    val nearDupDrops = Dedup
      .ngramJaccardPairs(exact, "doc_id", "text", cfg.nearDupNgram, cfg.nearDupThreshold)
      .select(col("b_id").as("doc_id"))
      .distinct()
    val deduped = exact.join(nearDupDrops, Seq("doc_id"), "left_anti")
    deduped
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .where(col("quality") >= cfg.minQuality)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe train/test split: a near-duplicate of a training
    * document sitting in the test set leaks memorized content into
    * evaluation, so the unit of assignment must be the near-dup
    * CLUSTER, never the document. Pairs come from the same exact
    * n-gram Jaccard generation the dedup pipeline uses; connected
    * components collapse transitive chains ((A,B),(B,C) => one
    * cluster); singletons are their own cluster. The side is a pure
    * function of the cluster id — uniform in [0,1) from the first 8
    * md5 hex digits — so the split is deterministic across reruns,
    * partitionings, and engines, and BY CONSTRUCTION no cluster
    * straddles the boundary.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      testFrac: Double,
      ngram: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(testFrac > 0 && testFrac < 1, "testFrac must be in (0, 1)")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", ngram, threshold)
    val comp = graft.operators.ConnectedComponents.components(
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    val withComp = docs.select(col("doc_id"))
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val u = conv(substring(md5(col("component").cast("string")), 1, 8), 16, 10)
      .cast("bigint").cast("double") / lit(4294967296.0)
    withComp.withColumn("split",
      when(u < lit(testFrac), lit("test")).otherwise(lit("train")))
  }

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  def qTrainingCorpus(spark: SparkSession, sfDir: String): DataFrame =
    prepare(Tables.spreadScan(Tables(spark, sfDir).documents), Config())

  def qLeakageSplit(spark: SparkSession, sfDir: String): DataFrame =
    leakageSafeSplit(Tables.spreadScan(Tables(spark, sfDir).documents), testFrac = 0.2)
      .orderBy(col("doc_id"))

  def queries: Map[String, Q] = Map(
    "q_training_corpus" -> (qTrainingCorpus _),
    "q_leakage_split" -> (qLeakageSplit _)
  )

  def oracles: Map[String, String] = Map(
    // the full pipeline re-derived independently in SQL: gates -> md5
    // min-id dedup -> 3-gram jaccard >= 0.8 drop-higher-id -> quality gate
    "q_training_corpus" ->
      """WITH gated AS (
        |  SELECT * FROM documents
        |  WHERE lang = 'en' AND n_chars BETWEEN 100 AND 10000),
        |exact AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM gated) WHERE rn = 1),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM exact),
        |sh AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |                                     for i in range(1, len(ts)-1)]) AS g
        |       FROM toks WHERE len(ts) >= 3),
        |ex AS (SELECT doc_id, unnest(g) AS gram FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
        |  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |drops AS (
        |  SELECT DISTINCT b_id FROM pairs
        |  JOIN (SELECT doc_id, len(g) n FROM sh) la ON la.doc_id = a_id
        |  JOIN (SELECT doc_id, len(g) n FROM sh) lb ON lb.doc_id = b_id
        |  WHERE common * 1.0 / (la.n + lb.n - common) >= 0.8),
        |surv AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT b_id FROM drops)),
        |scored AS (
        |  SELECT doc_id, lang, n_chars,
        |    round(
        |      0.4 * least(len(string_split_regex(trim(lower(text)), '\s+')) / 20.0, 1.0)
        |    + 0.2 * (1.0 - least(round(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
        |                               * 1.0 / greatest(length(text), 1), 6) * 5, 1.0))
        |    + 0.4 * least(len(list_distinct(string_split_regex(trim(lower(text)), '\s+')))
        |                  * 1.0 / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1) * 2, 1.0)
        |    , 6) AS quality
        |  FROM surv)
        |SELECT doc_id, lang, n_chars, quality FROM scored
        |WHERE quality >= 0.5 ORDER BY doc_id""".stripMargin,
    // same recursive-CTE clustering as the q_dedup_clusters oracle,
    // extended with singleton components and the md5 side assignment
    "q_leakage_split" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |                                    for i in range(1, len(ts)-1)]) AS sh
        |      FROM t WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |p AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) common
        |      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM p
        |  JOIN (SELECT doc_id, len(sh) n FROM s) la ON la.doc_id = a_id
        |  JOIN (SELECT doc_id, len(sh) n FROM s) lb ON lb.doc_id = b_id
        |  WHERE common * 1.0 / (la.n + lb.n - common) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        |allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |         FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
        |SELECT doc_id, component,
        |  CASE WHEN (('0x' || substring(md5(component::VARCHAR), 1, 8))::UBIGINT
        |             / 4294967296.0) < 0.2
        |       THEN 'test' ELSE 'train' END AS split
        |FROM allc ORDER BY doc_id""".stripMargin
  )
}
