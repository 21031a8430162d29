package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions

/** Hybrid retrieval (M3/M4 depth): fuse a LEXICAL ranking (Okapi BM25 over
  * the document text) with a SEMANTIC ranking (cosine over the embedding
  * column) via Reciprocal Rank Fusion (Cormack et al., SIGIR'09):
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d))
  *
  * — the standard production shape for RAG / training-data retrieval, where
  * neither sparse nor dense scores are comparable but their RANKS are.
  *
  * Distributed shape, sized for a 100 TB corpus and a broadcast-small query
  * set:
  *   - the lexical leg reuses [[TfIdf.bm25]] (one (doc, term)-keyed shuffle
  *     of the corpus; corpus scalars travel as 1-row broadcast aggregates)
  *     and joins the query terms in as a broadcast — scoring is
  *     score(q, d) = Σ_{t ∈ q} bm25(d, t), the bag-of-terms query model;
  *   - the semantic leg scans the embedding table ONCE against the
  *     broadcast query vectors with the codegen'd cosine expression —
  *     never shuffling the corpus (swap in [[Ivf.ivfPqTopK]] for the
  *     standing-index serving path at scale; brute keeps this query
  *     oracle-exact);
  *   - both legs cut to their per-query top-N with one window each, so the
  *     fusion join touches ≤ 2·N·|queries| rows regardless of corpus size.
  *
  * Scores are ROUNDED to 6 decimals BEFORE ranking on both legs: ranks are
  * the fusion's only input, and rounding first turns any
  * engine-vs-oracle floating-point daylight into exact ties that the id
  * tiebreaker then resolves identically on both sides.
  */
object HybridSearch {

  val RrfK: Int = 60 // the SIGIR'09 constant; dampens high-rank dominance

  /** Per-query lexical top-N: (q_id, doc_id, lex_rank). `queryDocs` must be
    * broadcast-small (id, text) rows; `docs` is the full corpus.
    */
  def lexicalTopN(
      docs: DataFrame,
      queryDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    val corpus = TfIdf.bm25(docs, idCol, textCol)
    val qTerms = queryDocs.select(
      col(idCol).as("q_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    val scored = corpus
      .join(broadcast(qTerms), Seq("term"))
      .where(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(round(sum(col("bm25")), 6).as("lex_score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("lex_score").desc, col("doc_id").asc)
    scored
      .withColumn("lex_rank", row_number().over(w).cast("bigint"))
      .where(col("lex_rank") <= n)
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
  }

  /** Per-query semantic top-N: (q_id, doc_id, sem_rank). One corpus scan,
    * query vectors broadcast.
    */
  def semanticTopN(
      embeddings: DataFrame,
      queryVecs: DataFrame,
      idCol: String,
      vecCol: String,
      n: Int
  ): DataFrame = {
    val q = queryVecs.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // spread the streamed side of the non-equi broadcast join: the
    // |corpus| x |queries| cosine kernel keeps the scan's partitioning,
    // and a single parquet split would run it all on one task (the
    // embeddingPairsExact shape — adaptive no-op at real scale)
    val scored = graft.core.Tables.spreadScanWide(embeddings
      .select(col(idCol).as("doc_id"), col(vecCol).as("n_vec")))
      .join(broadcast(q), col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"),
        round(VectorFunctions.cosineSim(col("q_vec"), col("n_vec")), 6).as("sem_score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sem_score").desc, col("doc_id").asc)
    scored
      .withColumn("sem_rank", row_number().over(w).cast("bigint"))
      .where(col("sem_rank") <= n)
      .select(col("q_id"), col("doc_id"), col("sem_rank"))
  }

  /** Fuse any number of (q_id, doc_id, rank) lists by RRF and keep the
    * per-query top-k. A candidate absent from a list contributes 0 for it
    * (the standard convention). Output: (q_id, rank, doc_id, rrf).
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = RrfK): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.map { l =>
      val rankCol = l.columns.filterNot(Set("q_id", "doc_id")).head
      l.select(col("q_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col(rankCol))).as("contrib"))
    }
    // union-then-sum rather than a chain of full-outer joins: associative,
    // list-count-agnostic, and one tiny shuffle keyed (q_id, doc_id)
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("rrf"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** End-to-end hybrid search over a corpus whose text and embeddings share
    * an id space: `queryPred` (a predicate over the shared `doc_id` column)
    * selects the broadcast-small query set on both legs.
    */
  def hybridTopK(
      docs: DataFrame,
      embeddings: DataFrame,
      queryPred: Column,
      n: Int,
      k: Int
  ): DataFrame = {
    val lex = lexicalTopN(docs, docs.where(queryPred), "doc_id", "text", n)
    val sem = semanticTopN(
      embeddings, embeddings.where(queryPred), "doc_id", "embedding", n)
    rrfFuse(Seq(lex, sem), k)
  }

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  /** Hybrid RRF retrieval: every doc with doc_id % 97 == 0 queries the
    * corpus; lexical and semantic top-20 lists fuse to a top-5.
    */
  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val embs = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    hybridTopK(t.documents, embs, col("doc_id") % 97 === 0, n = 20, k = 5)
  }

  def queries: Map[String, Q] = Map(
    "q_hybrid_rrf" -> (qHybridRrf _))

  def oracles: Map[String, String] = Map(
    "q_hybrid_rrf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |corpus AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |bm25 AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (c.n - df.df + 0.5) / (df.df + 0.5))
        |      * tf.tf * (1.2 + 1.0)
        |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl)) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN corpus c),
        |qterms AS (
        |  SELECT DISTINCT doc_id AS q_id, term FROM terms WHERE doc_id % 97 = 0),
        |lex_scored AS (
        |  SELECT q.q_id, b.doc_id, round(sum(b.bm25), 6) AS lex_score
        |  FROM bm25 b JOIN qterms q USING (term)
        |  WHERE b.doc_id != q.q_id
        |  GROUP BY q.q_id, b.doc_id),
        |lex AS (
        |  SELECT q_id, doc_id,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY lex_score DESC, doc_id) AS rnk
        |  FROM lex_scored),
        |sem_scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sem_score
        |  FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
        |  WHERE q.vec_id % 97 = 0),
        |sem AS (
        |  SELECT q_id, doc_id,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY sem_score DESC, doc_id) AS rnk
        |  FROM sem_scored),
        |contrib AS (
        |  SELECT q_id, doc_id, 1.0 / (60 + rnk) AS contrib FROM lex WHERE rnk <= 20
        |  UNION ALL
        |  SELECT q_id, doc_id, 1.0 / (60 + rnk) AS contrib FROM sem WHERE rnk <= 20),
        |fused AS (
        |  SELECT q_id, doc_id, round(sum(contrib), 6) AS rrf
        |  FROM contrib GROUP BY q_id, doc_id),
        |ranked AS (
        |  SELECT q_id, doc_id, rrf,
        |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
        |  FROM fused)
        |SELECT q_id, rank, doc_id, rrf FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin
  )
}
