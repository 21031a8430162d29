package graft.text

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** Standing BM25 inverted index — the lexical twin of the ANN standing
  * indexes ([[Ivf]]/[[Pq]]): the corpus is tokenized, scored, and laid
  * out ONCE; every retrieval after that touches only the (much smaller)
  * index tables and never re-scans the corpus. This is the shape a
  * recurring 100 TB retrieval workload needs — [[TfIdf.bm25]] recomputes
  * tf/df/avgdl per query batch, which is the right call exactly once.
  *
  * Layout (three lake tables under one directory):
  *   - `postings`: (term, doc_id, tf, dl) — sort-clustered by term, so
  *     a query's terms prune to a handful of files via the lake's
  *     stats-based file skipping instead of scanning all postings;
  *   - `terms`: (term, df) — the vocabulary-sized document frequencies;
  *   - `stats`: one row (n_docs, avgdl) — the corpus scalars.
  *
  * Serving joins the pruned postings to the query terms and scores the
  * standard Okapi form; the only shuffle is the per-(query, doc) sum,
  * keyed far below corpus size. Scores round(…, 6) BEFORE ranking so an
  * ulp of sum-order drift can never flip a rank across engines.
  */
object InvertedIndex {

  private def sub(dir: String, name: String) = new Path(dir, name).toString

  /** Build (or rebuild) the index at `dir` from `docs`. One corpus scan
    * feeds the postings aggregate; the df and stats tables derive from
    * the WRITTEN postings lake, so the corpus is never read twice.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String): Unit = {
    val spark = docs.sparkSession
    val postings = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val p = LakeTable(spark, sub(dir, "postings"))
    p.write(postings)
    // single-dimension clustering: a linear sort IS the optimal curve
    // (a 1-D Z-order degenerates to the same ordering, minus exactness —
    // the string curve key ranks only a 6-byte prefix)
    p.optimize(Seq("term"), numFiles = Some(8))
    // postings rows are distinct (doc, term), so df is a plain rollup
    LakeTable(spark, sub(dir, "terms"))
      .write(p.read.groupBy(col("term")).agg(count(lit(1)).as("df")))
    LakeTable(spark, sub(dir, "stats")).write(
      p.read.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")))
  }

  def exists(spark: SparkSession, dir: String): Boolean =
    LakeTable(spark, sub(dir, "stats")).exists

  /** Top-k BM25 retrieval against the standing index. `queries` is
    * (query_id, term) rows — a query WORKLOAD, bounded by construction,
    * so collecting its distinct terms into a literal IN-list (the same
    * bounded-payload idiom the merge key prune uses) is what lets the
    * term-clustered postings lake skip files instead of scanning.
    */
  def serveBm25(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(qterms.nonEmpty, "serveBm25 needs a non-empty query workload")
    val postings = LakeTable(spark, sub(dir, "postings")).read
      .where(col("term").isin(qterms: _*))
    val dfT = LakeTable(spark, sub(dir, "terms")).read
      .where(col("term").isin(qterms: _*))
    val stats = LakeTable(spark, sub(dir, "stats")).read
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    postings
      .join(broadcast(queries.select(col("query_id"), col("term"))), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
