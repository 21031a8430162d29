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

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  def qTrainingCorpus(spark: SparkSession, sfDir: String): DataFrame =
    prepare(Tables(spark, sfDir).documents, Config())

  def queries: Map[String, Q] = Map(
    "q_training_corpus" -> (qTrainingCorpus _)
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
        |WHERE quality >= 0.5 ORDER BY doc_id""".stripMargin
  )
}
