package graft.text

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for M3 (complements the hyperplane-LSH variant in
  * [[Similarity.lshTopK]]).
  *
  * Index: seeded k-means over the corpus; every vector is assigned to its
  * nearest centroid cell (one narrow int column — at 100 TB this is the
  * cheap, write-once part). Query: score only vectors in the `nProbe`
  * cells whose centroids are closest to the query — cost drops from
  * |corpus| to ~|corpus| * nProbe / nCells per query, at recall measured
  * in SimilaritySpec.
  */
object Ivf {

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("features", array_to_vector(col("n_vec")))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(c)
    val assigned = model.transform(c).select(col("n_id"), col("n_vec"), col("cell"))

    // centroids as a tiny DF of (cell, center) — broadcast to score queries
    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat))
    }.toSeq.toDF("cell", "center")

    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centers))
      .withColumn("cdist", -VectorFunctions.cosineSim(col("q_vec"), col("center")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell"))

    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        VectorFunctions.cosineSim(col("q_vec"), col("n_vec")).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }
}
