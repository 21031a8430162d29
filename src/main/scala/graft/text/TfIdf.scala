package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TF-IDF term scoring over a document corpus (M4 depth): term frequency
  * by explode+count, document frequency by distinct-explode+count, idf =
  * ln(N / df), all as one declarative flow. The df table is |vocab|-sized
  * -> broadcast onto the tf table; the only big shuffle is the tf groupBy,
  * keyed by (doc, term) which cannot skew beyond one document's length.
  */
object TfIdf {

  /** (doc_id, term, tf, tfidf) for every document-term.
    *
    * Every derived table (df, corpus size) hangs off the ONE (doc, term)
    * aggregate: tf is already the distinct (doc, term) set, so df is a
    * groupBy over it rather than a second explode+distinct of the raw
    * token stream — the exploded scan runs once and the tf exchange is
    * byte-identical across branches, so ReuseExchange computes it once.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // corpus size as a 1-row aggregate broadcast onto the df table (a
    // BroadcastNestedLoopJoin with a single-row build side) — a driver-side
    // docs.count() here would force an extra full scan of the corpus per run
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // NO broadcast hint on the vocab: |vocab| is unbounded at corpus scale
    // (it would blow the broadcast limit at 100 TB); AQE decides at runtime
    // from actual stage stats — it still broadcasts when the vocab is small
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
    tf.join(df, Seq("term"))
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
  }

  /** Okapi BM25 score for every (doc, term): the retrieval-grade upgrade
    * of tf-idf — tf saturates at k1, and scores normalize by document
    * length against the corpus average. Same distributed shape as
    * [[tfidf]]: the only big shuffle keys on (doc, term); corpus-level
    * scalars (N, avgdl) travel as 1-row broadcast aggregates, never as
    * driver-side actions; idf uses the standard
    * ln(1 + (N - df + 0.5)/(df + 0.5)) form (always positive).
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    // dl (doc length) is functionally dependent on the doc, so it RIDES
    // ALONG as a groupBy key instead of being aggregated separately and
    // joined back — same group cardinality, one fewer shuffle of the big
    // table. (A window formulation — count().over(partitionBy(term)) — was
    // also measured: the term-partition sort made it 2x slower than this
    // aggregate+broadcast-join shape at sf0.1.)
    val toks = docs.select(
      col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // vocab-keyed doc frequency: unhinted join, AQE broadcasts when small
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N and avgdl as one 1-row aggregate over docs (no explode needed:
    // avgdl = mean token count), broadcast-cross-joined
    val corpus = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(TextFunctions.tokens(col(textCol)))).as("__avgdl"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("bm25",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl"))))
      .select(col("doc_id"), col("term"), col("tf"), col("bm25"))
  }

  /** Top-k BM25 terms per document. */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("bm25").desc, col("term").asc)
    bm25(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("bm25"), 6).as("bm25"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Top-k most characteristic terms per document. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  // NOT spread: tf-idf/BM25 shuffle (doc, term) aggregates right after
  // the tokenize — the 3-pass bench showed the extra round-robin
  // exchange as a loss (tfidf 1.48 -> 1.85 s, bm25 ~flat), so the
  // shuffle the aggregation needs anyway is the parallelism source
  def qTopTerms(spark: SparkSession, sfDir: String): DataFrame =
    topTerms(Tables(spark, sfDir).documents, "doc_id", "text", k = 3)

  def qBm25TopTerms(spark: SparkSession, sfDir: String): DataFrame =
    bm25TopTerms(Tables(spark, sfDir).documents, "doc_id", "text", k = 3)

  /** Standing-index retrieval: [[InvertedIndex.build]] lays the corpus
    * out once (Z-ordered postings + df + stats lakes), then a 5-query
    * workload retrieves top-5 docs through [[InvertedIndex.serveBm25]]
    * WITHOUT re-scanning the corpus. The bench run deliberately pays the
    * build too (the IVF-PQ convention) so staleness can never split the
    * query from its oracle; the serve-only path is pinned in
    * InvertedIndexSpec. Query terms are each query doc's 3 smallest
    * distinct tokens — derivable identically in both engines.
    */
  def qBm25Standing(spark: SparkSession, sfDir: String): DataFrame = {
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_models", sf, "bm25_index").toString
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    InvertedIndex.build(docs, "doc_id", "text", dir)
    val queries = docs
      .where(col("doc_id") % 100 === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("query_id"),
        explode(slice(array_sort(array_distinct(
          TextFunctions.tokens(col("text")))), 1, 3)).as("term"))
    InvertedIndex.serveBm25(spark, dir, queries, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The PURE-SQL serving spelling of the standing index: build once,
    * then retrieve through the `graft_bm25_topk` TVF — the statement a
    * SQL-only user runs against an index another job maintains. The
    * query text is doc 0's two alphabetically-first distinct tokens
    * (derivable identically in the oracle), so the whole path — index
    * layout, term IN-list pruning, BM25 arithmetic, tie-break — is
    * content-checked from SQL in, rows out.
    */
  def qBm25SqlTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_models", sf, "bm25_index_sql").toString
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    InvertedIndex.build(docs, "doc_id", "text", dir)
    val terms = docs.where(col("doc_id") === 0)
      .select(explode(slice(array_sort(array_distinct(
        TextFunctions.tokens(col("text")))), 1, 2)).as("term"))
      .collect().map(_.getString(0)).toSeq
    val query = terms.mkString(" ").replace("\\", "\\\\").replace("'", "\\'")
    spark.sql(s"SELECT * FROM graft_bm25_topk('$dir', '$query', 5)")
  }

  def queries: Map[String, Q] = Map(
    "q_tfidf_top_terms" -> (qTopTerms _),
    "q_bm25_standing" -> (qBm25Standing _),
    "q_bm25_sql_topk" -> (qBm25SqlTopk _),
    "q_bm25_top_terms" -> (qBm25TopTerms _))

  def oracles: Map[String, String] = Map(
    // same corpus arithmetic as q_bm25_standing, single query = doc 0's
    // two alphabetically-first distinct tokens (what the TVF was handed)
    "q_bm25_sql_topk" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |corpus AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |q AS (
        |  SELECT DISTINCT unnest(list_sort(list_distinct(
        |      string_split_regex(trim(lower(text)), '\s+')))[1:2]) AS term
        |  FROM documents WHERE doc_id = 0),
        |scored AS (
        |  SELECT tf.doc_id,
        |    round(sum(
        |      ln(1.0 + (c.n - df.df + 0.5) / (df.df + 0.5))
        |        * tf.tf * (1.2 + 1.0)
        |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl))), 6) AS score
        |  FROM q JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        |       JOIN df USING (term) CROSS JOIN corpus c
        |  GROUP BY tf.doc_id),
        |ranked AS (
        |  SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, score FROM ranked
        |WHERE rank <= 5 ORDER BY rank""".stripMargin,
    "q_bm25_standing" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |corpus AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    unnest(list_sort(list_distinct(
        |      string_split_regex(trim(lower(text)), '\s+')))[1:3]) AS term
        |  FROM documents WHERE doc_id % 100 = 0 AND doc_id < 500),
        |scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(
        |      ln(1.0 + (c.n - df.df + 0.5) / (df.df + 0.5))
        |        * tf.tf * (1.2 + 1.0)
        |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl))), 6) AS score
        |  FROM q JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        |       JOIN df USING (term) CROSS JOIN corpus c
        |  GROUP BY q.query_id, tf.doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, doc_id, score FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_tfidf_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln(n.n * 1.0 / df.df) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_bm25_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |corpus AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (c.n - df.df + 0.5) / (df.df + 0.5))
        |      * tf.tf * (1.2 + 1.0)
        |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl)) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN corpus c),
        |ranked AS (
        |  SELECT doc_id, term, bm25,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, round(bm25, 6) AS bm25 FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  )
}
