package graft.text

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.LakeTable

/** MATERIALIZED IVF serving index — the I/O layer under [[Ivf.ivfTopK]]:
  * that path prunes logically (only probed cells join) but still SCANS
  * the whole corpus to assign cells per run. Here the assignment is laid
  * down once as a postings lake CLUSTERED BY CELL with file stats, so a
  * probe's `cell IN (…)` read prunes at the FILE level — a serve touches
  * ~nProbe/nCells of the bytes, which is the difference that matters
  * when the corpus is 100 TB and the query batch is small.
  *
  * Incremental maintenance ([[append]]) assigns NEW vectors against the
  * standing quantizer and appends — no refit, no rewrite of existing
  * postings; compact the cell clustering on your maintenance cadence
  * (`optimizeWhere`, same as any hot lake table). The trade every IVF
  * system makes: drifted data degrades cell balance until the next
  * refit, it never breaks correctness (assignment stays nearest-center).
  *
  * Layout: `centers` (cell, center) and `postings` (cell, vec_id, vec),
  * both ordinary lake tables with history.
  */
object IvfIndex {

  private def sub(dir: String, name: String) = new Path(dir, name).toString

  def build(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = 16, seed: Long = 42L, sampleFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    val centers = Ivf.fitCentroids(corpus, vecCol, nCells, seed, sampleFraction)
    LakeTable(spark, sub(dir, "centers")).write(centers)
    val p = LakeTable(spark, sub(dir, "postings"))
    p.write(assigned(corpus, centers, idCol, vecCol))
    p.optimize(Seq("cell"), numFiles = Some(math.max(nCells / 2, 4)))
    p.collectStats(Seq("cell"))
  }

  /** Add vectors to a standing index without refitting: map-only
    * assignment against the saved quantizer, one append commit. New
    * files carry their own cell stats once [[LakeTable.refreshStats]] /
    * the next optimize pass runs; until then they are read unpruned —
    * correct, just not yet skipped.
    */
  def append(df: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = df.sparkSession
    val centers = LakeTable(spark, sub(dir, "centers")).read
    val p = LakeTable(spark, sub(dir, "postings"))
    p.write(assigned(df, centers, idCol, vecCol), SaveMode.Append)
    p.refreshStats()
  }

  private def assigned(
      df: DataFrame, centers: DataFrame, idCol: String, vecCol: String): DataFrame =
    Ivf.assignCells(
      df.select(col(idCol).as("vec_id"), col(vecCol).as("vec")), centers, "vec")
      .select(col("cell"), col("vec_id"), col("vec"))

  /** Top-k cosine retrieval: per query the `nProbe` nearest cells, then
    * ONE stats-skipped postings read for the probed-cell union (the
    * bounded IN-list — |queries|·nProbe cells at most), exact cosine
    * inside candidates, rank on pre-rounded scores.
    */
  def serveTopK(
      spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val centers = LakeTable(spark, sub(dir, "centers")).read
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centers))
      .withColumn("cdist", -VectorFunctions.cosineSim(col("q_vec"), col("center")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell"))
      .localCheckpoint(true) // reused for the cell list AND the join
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    require(cells.nonEmpty, "serveTopK needs a non-empty query batch")
    val candidates = LakeTable(spark, sub(dir, "postings"))
      .readWhere(col("cell").isin(cells: _*))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates
      .join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosineSim(col("q_vec"), col("vec")), 6).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }
}
