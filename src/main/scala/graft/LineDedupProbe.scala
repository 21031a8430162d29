package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Line-dedup scale probe (not part of the driver contract): C4-style
  * line excision timed at 1× and 10× the corpus in BOTH df regimes the
  * operator can meet —
  *   - VERBATIM replication: every line's document frequency multiplies
  *     by the replication factor, so the "hot" line set saturates to the
  *     entire distinct-line universe (boilerplate-apocalypse worst case;
  *     the hot-set join must survive NOT being broadcastable);
  *   - SALTED replication: replica r prepends r+1 salt tokens, so every
  *     replica's chunk boundaries sit at a DIFFERENT offset into the
  *     original words — replicas share almost no lines and the cold
  *     path (df below threshold) dominates, the realistic 100 TB shape
  *     where boilerplate is a small fraction. (A single fixed-length
  *     salt would only perturb the first chunk: all later chunks still
  *     align across replicas and saturate hot.)
  * Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.LineDedupProbe [rep]
  */
object LineDedupProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))

    def replicate(salt: Boolean) = base
      .crossJoin(spark.range(rep).select(col("id").as("__r")))
      .select(
        (col("doc_id") * rep + col("__r")).as("doc_id"),
        (if (salt)
           concat(expr("repeat(concat('x', __r, ' '), cast(__r + 1 as int))"),
             col("text"))
         else col("text")).as("text"))

    def run(label: String, docs: org.apache.spark.sql.DataFrame): Unit = {
      val pinned = docs.localCheckpoint(true)
      val nDocs = pinned.count()
      val t0 = System.nanoTime()
      val out = graft.text.CorpusOps
        .dedupLines(pinned, "doc_id", "text", lineWidth = 8, maxDf = 2)
        .agg(sum(col("n_lines")).as("lines"), sum(col("n_kept")).as("kept"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"probe":"linededup","variant":"$label","docs":$nDocs,""" +
          s""""lines":${out.getLong(0)},"kept":${out.getLong(1)},""" +
          f""""secs":$secs%.2f}""")
    }

    run("base_1x", base)
    run(s"verbatim_${rep}x", replicate(salt = false))
    run(s"salted_${rep}x", replicate(salt = true))
    spark.stop()
  }
}
