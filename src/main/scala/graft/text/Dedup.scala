package graft.text

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators (north-star pillar; SURVEY §2 M1/M2 + SimHash +
  * n-gram Jaccard + embedding near-dup).
  *
  * Scale design notes:
  *   - exact dedup = hash groupBy: one shuffle on a 128-bit hash, no skew
  *     (hashes are uniform).
  *   - n-gram Jaccard uses the inverted-index shingle join (explode ->
  *     join on shingle -> count), NOT an O(n²) cross join; common-shingle
  *     counting shuffles on the shingle, so hot shingles are the skew risk —
  *     mitigated by dropping ubiquitous shingles (doc-frequency cap), the
  *     standard trick.
  *   - MinHash LSH (banding) and SimHash (bit-vote + band join) give the
  *     sub-quadratic candidate generation used at 100 TB; both seeded for
  *     determinism.
  *   - embedding near-dup: random-hyperplane sign buckets then exact cosine
  *     refine within buckets.
  */
object Dedup {

  /** Exact dedup: keep the smallest-id row per distinct text hash.
    * Deterministic survivor (unlike bare dropDuplicates).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact n-gram Jaccard pairs >= threshold via inverted-index join.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *                     docs (ubiquitous-shingle skew guard; None = keep
    *                     all, required for oracle parity at test scale)
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = None
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n_sh"))
    val exploded0 = sh.select(col("id"), explode(col("sh")).as("g"))
    val exploded = maxShingleDf match {
      case Some(cap) =>
        val hot = exploded0.groupBy("g").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("g")
        exploded0.join(broadcast(hot), Seq("g"), "left_anti")
      case None => exploded0
    }
    val common = exploded.as("a")
      .join(exploded.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("a_id") === col("sa.id"))
      .join(sizes.as("sb"), col("b_id") === col("sb.id"))
      .select(
        col("a_id"),
        col("b_id"),
        (col("common").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("common"))).as("jaccard")
      )
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash-LSH near-dup candidate pairs at jaccardDistance <= 1-threshold
    * (seeded, deterministic). Returns (a_id, b_id, jaccard_dist).
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      numHashTables: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    val spark = df.sparkSession
    val sh = df.select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features").setNumFeatures(1 << 18)
    val feat = tf.transform(sh)
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = mh.fit(feat)
    model
      .approxSimilarityJoin(feat, feat, 1.0 - threshold, "dist")
      .where(col("datasetA.id") < col("datasetB.id"))
      .select(
        col("datasetA.id").as("a_id"),
        col("datasetB.id").as("b_id"),
        round(col("dist"), 6).as("jaccard_dist")
      )
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash per document: per-token xxhash64, bitwise vote,
    * sign -> bit. Pure expressions: 64 bit-vote sums folded into a long.
    */
  def simhash64(text: Column): Column = {
    val ts = TextFunctions.tokens(text)
    val hashes = transform(ts, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(
        hashes,
        lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)
      )
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, via
    * 4x16-bit band join (a pair within hamming<=3 shares >=1 exact band).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int
  ): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val bands = sh.select(
      col("id"),
      col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("v"))
      }: _*)).as("bv")
    ).select(col("id"), col("sig"), col("bv.band"), col("bv.v"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding cosine near-dup: random-hyperplane LSH buckets (seeded) then
    * exact cosine refine inside each bucket. Sub-quadratic at scale; recall
    * measured vs brute force in SimilaritySpec.
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nPlanes: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val planeCols = planes.zipWithIndex.map { case (p, i) =>
      val lit_p = array(p.map(x => lit(x)): _*)
      when(VectorFunctions.dot(col(vecCol), lit_p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      planeCols.reduce(_ + _).as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"),
        VectorFunctions.cosineSim(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
