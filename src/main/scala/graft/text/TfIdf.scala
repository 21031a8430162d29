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

  /** (doc_id, term, tf, tfidf) for every document-term. */
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
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
    tf.join(df, Seq("term"))
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
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

  def qTopTerms(spark: SparkSession, sfDir: String): DataFrame =
    topTerms(Tables(spark, sfDir).documents, "doc_id", "text", k = 3)

  def queries: Map[String, Q] = Map("q_tfidf_top_terms" -> (qTopTerms _))

  def oracles: Map[String, String] = Map(
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
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  )
}
