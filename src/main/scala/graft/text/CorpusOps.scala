package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-preparation operators a pretraining-data pipeline runs between
  * filtering and writing shards: language-model quality scoring, in-document
  * repetition removal, and reproducible global example ordering. All three
  * are fully deterministic, so each is DuckDB-oracle-matched (the sampled /
  * scored / reordered rows themselves, not just counts).
  */
object CorpusOps {

  type Q = (SparkSession, String) => DataFrame

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Unigram language-model quality score (the CCNet-style perplexity
    * filter, with the corpus's own unigram distribution standing in for
    * the external KenLM): mean token log-probability under unigram
    * frequencies, plus the perplexity `exp(-mean)`. Low-probability token
    * soup scores high-perplexity and gets filtered.
    *
    * Scale shape: two corpus scans by construction (a model-then-score
    * pipeline). Scan 1 builds the unigram table — map-side partial
    * aggregation collapses it to vocab size, which is small and
    * broadcast. Scan 2 explodes tokens, broadcast-joins the model (no
    * corpus shuffle), and the per-doc aggregate is the only exchange.
    */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir).documents
    val tok = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .where(col("tok") =!= "")
    val counts = tok.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("n"))
    // total token count as a 1-row broadcast (TfIdf-style), never a
    // driver collect
    val total = counts.agg(sum(col("n")).as("total"))
    tok
      .join(broadcast(counts), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("n") / col("total"))), 4).as("mean_logprob"),
        round(exp(-avg(log(col("n") / col("total")))), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** In-document repetition removal: keep each token's FIRST occurrence,
    * preserving original order — the word-granularity analogue of C4's
    * duplicate-line drop (this corpus has no line structure). Emits
    * before/after token counts and the md5 of the rebuilt text so the
    * transform itself (not just its size) is oracle-checked.
    *
    * Scale shape: MAP-ONLY. The dedup is one pass per row
    * ([[graft.functions.FirstOccurrenceTokensExpr]] — a LinkedHashSet in
    * plain JVM code), so no (doc, token) shuffle and no per-group
    * collect exist at all; the only exchange is the output ordering. The
    * DuckDB oracle reconstructs the identical values relationally
    * (unnest + min(pos) + ordered string_agg).
    */
  def docTokenDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    val dedup = graft.functions.TextExpressions.firstOccurrenceTokens(t)
    Tables(spark, sfDir).documents
      .select(
        col("doc_id"),
        size(t).cast("bigint").as("n_tokens"),
        size(dedup).cast("bigint").as("n_uniq"),
        md5(array_join(dedup, " ")).as("dedup_hash"))
      .orderBy(col("doc_id"))
  }

  /** Reproducible global shuffle for training-example ordering: a seeded
    * md5 shuffle key gives every run (and every engine) the SAME
    * pseudo-random permutation, plus a deterministic shard assignment
    * from the key's leading byte.
    *
    * Scale shape: writing shards ordered by `skey` is
    * `repartitionByRange(skey) + sortWithinPartitions` — a total order
    * across output files WITHOUT a global row-number window (which would
    * serialize on one partition). The oracle checks the permutation via
    * ORDER BY skey; no rank column is materialized for exactly that
    * reason.
    */
  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents
      .select(
        md5(concat(lit("graft-shuffle-42:"), col("doc_id").cast("string")))
          .as("skey"),
        col("doc_id"))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 2), 16, 10).cast("int") % 8).cast("int"))
      .orderBy(col("skey"))

  def queries: Map[String, Q] = Map(
    "q_unigram_logprob" -> (unigramLogprob _),
    "q_doc_token_dedup" -> (docTokenDedup _),
    "q_corpus_shuffle" -> (corpusShuffle _)
  )

  def oracles: Map[String, String] = Map(
    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |nonempty AS (SELECT * FROM toks WHERE tok <> ''),
        |cnt AS (SELECT tok, count(*)::DOUBLE AS n FROM nonempty GROUP BY tok),
        |tot AS (SELECT sum(n) AS total FROM cnt)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(n / total)), 4) AS mean_logprob,
        |  round(exp(-avg(ln(n / total))), 2) AS ppl
        |FROM nonempty JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_doc_token_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |firsts AS (
        |  SELECT doc_id, tok, min(pos) AS p, count(*) AS reps
        |  FROM toks GROUP BY doc_id, tok)
        |SELECT doc_id, sum(reps)::BIGINT AS n_tokens, count(*)::BIGINT AS n_uniq,
        |  md5(string_agg(tok, ' ' ORDER BY p)) AS dedup_hash
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT md5('graft-shuffle-42:' || doc_id::VARCHAR) AS skey, doc_id,
        |  (('0x' || substring(md5('graft-shuffle-42:' || doc_id::VARCHAR), 1, 2))::INT % 8)::INT AS shard
        |FROM documents ORDER BY skey""".stripMargin
  )
}
