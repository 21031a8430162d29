package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (PQ) — the embedding COMPRESSION path for M3,
  * complementing the pruning paths (IVF cells, LSH buckets): each vector is
  * cut into `m` subvectors and every subvector replaced by the id of its
  * nearest per-subspace centroid, so a d-dim float vector becomes `m` small
  * ints (64 dims × 4 B = 256 B → 8 codes ≈ 8 B at k ≤ 256). Queries score
  * compressed codes via ADC (asymmetric distance computation): the query
  * stays exact, each code is looked up in a per-query table of
  * query-subvector × centroid dot products, and the approximate similarity
  * is the sum of `m` table entries — no decompression, no full-width float
  * math per corpus row. Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", IEEE TPAMI 2011.
  *
  * Scale design:
  *   - codebooks are tiny (m × k × d/m floats) and fit on a seeded SAMPLE
  *     (like [[Ivf.fitCentroids]] — centroid quality converges long before
  *     the corpus is seen); encoding is map-only: m fused
  *     [[graft.functions.NearestCentroid]] argmins per row, no shuffle.
  *   - at 100 TB the codes column is what an ANN serving tier keeps hot:
  *     32× less memory than raw vectors at m=8, k=16 over 64 dims.
  *   - ADC tables are built per QUERY (queries are few by definition) with
  *     one broadcast join over the codebook table; scoring broadcasts
  *     (query, table) against the codes scan — corpus never shuffles.
  *   - vectors are L2-normalized before fit/encode so the approximated
  *     inner product IS cosine similarity (the standard cosine-PQ recipe).
  */
object Pq {

  /** Codebooks: (subspace, cell, center) — seeded euclidean k-means for
    * EVERY subspace trained in ONE fused Lloyd's loop: the sample is
    * exploded to (subspace, subvector) points once, and each iteration is
    * a single assignment pass (an m-branch fused argmin) plus one
    * per-(subspace, cell, dim) mean — so the pass count is `iters`,
    * independent of m. The previous shape (m sequential `KMeans.fit`
    * calls) cost m full passes PER Lloyd iteration and measured 46 s at
    * 100k vectors where this loop converges in a few seconds. Only the
    * tiny m x k x d/m centroid matrix ever reaches the driver.
    *
    * Initialization is the seeded hash-order pick of k distinct
    * subvectors per subspace — deterministic across partitionings (mean
    * reduction order can still drift centroids by ulps, the same caveat
    * MLlib's KMeans carries).
    */
  def fitCodebooks(
      corpus: DataFrame,
      vecCol: String,
      m: Int = 16,
      k: Int = 16,
      seed: Long = 42L,
      sampleFraction: Double = 1.0,
      iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val dims = corpus.select(size(col(vecCol)).as("d")).na.drop().limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("empty corpus"))
    require(dims % m == 0, s"vector dim $dims not divisible by m=$m subspaces")
    val dsub = dims / m
    val base =
      if (sampleFraction < 1.0)
        corpus.sample(withReplacement = false, sampleFraction, seed)
      else corpus
    val points = base.select(normalized(col(vecCol)).as("v"))
      .select(explode(array((0 until m).map { j =>
        struct(lit(j).as("j"), slice(col("v"), j * dsub + 1, dsub).as("sub"))
      }: _*)).as("p"))
      .select(col("p.j").as("j"), col("p.sub").as("sub"))
      .cache()
    try {
      // init: k distinct subvectors per subspace in seeded-hash order
      val w = Window.partitionBy(col("j"))
        .orderBy(xxhash64(col("sub"), lit(seed)).asc)
      val init = points.dropDuplicates("j", "sub")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
        .collect()
        .map(r => (r.getInt(0), r.getInt(2) - 1,
          r.getSeq[Float](1).map(_.toDouble).toArray))
      var mat: Array[Array[Array[Double]]] =
        Array.tabulate(m)(j => init.filter(_._1 == j).sortBy(_._2).map(_._3))
      // every subspace must seed EXACTLY k cells: adcTopK flattens the
      // lookup table as idx = j*k + code, so a short subspace would make
      // codes from full subspaces silently read a neighboring subspace's
      // slot — wrong scores, not an error
      require(mat.forall(_.length == k),
        s"k=$k distinct subvectors required per subspace but got counts " +
          s"${mat.map(_.length).mkString("[", ",", "]")} — " +
          "increase sampleFraction or lower k")

      def assignExpr(): Column = {
        var acc: Column = null
        (0 until m).foreach { j =>
          val nc = VectorFunctions.nearestCentroid(
            col("sub"), mat(j).map(_.toIndexedSeq).toIndexedSeq)
          acc = if (acc == null) when(col("j") === j, nc)
          else acc.when(col("j") === j, nc)
        }
        acc
      }
      var it = 0
      while (it < iters) {
        val means = points
          .withColumn("cell", assignExpr())
          .select(col("j"), col("cell"), posexplode(col("sub")).as(Seq("dim", "x")))
          .groupBy(col("j"), col("cell"), col("dim"))
          .agg(avg(col("x")).as("c"))
          .collect()
        // empty cells keep their previous centroid
        means.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
          case ((j, cell), rows) =>
            val cvec = new Array[Double](dsub)
            rows.foreach(r => cvec(r.getInt(2)) = r.getDouble(3))
            mat(j)(cell) = cvec
        }
        it += 1
      }
      (0 until m).flatMap { j =>
        mat(j).zipWithIndex.map { case (cvec, cell) =>
          (j, cell, cvec.map(_.toFloat))
        }
      }.toDF("subspace", "cell", "center")
    } finally { points.unpersist(); () }
  }

  /** L2-normalize; an all-zero vector maps to the zero vector — its dot
    * products are 0 and its ranking deterministic — instead of 0/0 NaN
    * subvectors poisoning codebook means and ADC top-k ordering.
    * ([[VectorFunctions.cosineSim]] nulls zero-norm pairs; codes have no
    * null slot, so zero is the quantization-side analogue.)
    */
  private def normalized(v: Column): Column = {
    val n = VectorFunctions.l2Norm(v)
    transform(v, x => when(n > 0, x / n).otherwise(lit(0.0)).cast("float"))
  }

  /** Encode every corpus vector as `m` centroid codes (array<int>) — one
    * fused argmin expression per subspace, map-only, stays in codegen.
    */
  def encode(df: DataFrame, codebooks: DataFrame, vecCol: String): DataFrame = {
    val local = collectBooks(codebooks)
    val m = local.length
    val dsub = local.head.head.length
    val v = normalized(col(vecCol))
    val codeCols = (0 until m).map { j =>
      VectorFunctions.nearestCentroid(slice(v, j * dsub + 1, dsub), local(j))
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** Persist codebooks as a standing index (a lake table — versioned,
    * with commit history), so repeat queries and incremental encodes
    * reuse one quantizer across jobs, like [[Ivf.saveIndex]].
    */
  def saveCodebooks(codebooks: DataFrame, path: String): Unit =
    graft.sources.LakeTable(codebooks.sparkSession, path).write(codebooks): Unit

  /** Load a standing codebook index written by [[saveCodebooks]]. */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    graft.sources.LakeTable(spark, path).read

  /** codebooks DF -> matrix ordered [subspace][cell][dim]. */
  private def collectBooks(codebooks: DataFrame): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rows = codebooks.select(col("subspace"), col("cell"), col("center"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toIndexedSeq))
    require(rows.nonEmpty, "empty codebook index")
    rows.groupBy(_._1).toIndexedSeq.sortBy(_._1).map {
      case (_, cells) => cells.sortBy(_._2).map(_._3).toIndexedSeq
    }
  }

  /** Top-k approximate-cosine neighbors per query over PQ codes via ADC.
    *
    * @param codes  corpus with a `codes` column from [[encode]] plus the id
    * @param queries raw query vectors (kept exact — the asymmetric side)
    */
  /** Per-query ADC lookup tables: dot(query-subvector, centroid) for
    * every (subspace, cell) — m*k entries, flattened so entry (j, c)
    * sits at j*nCells + c. Queries are few; the codebook side is a
    * broadcast. Returns ((q_id, tbl), nCells) — shared by the full-scan
    * [[adcTopK]] and the cell-pruned [[Ivf.ivfPqTopK]] composition.
    */
  private[text] def adcTables(
      queries: DataFrame,
      codebooks: DataFrame,
      idCol: String,
      vecCol: String): (DataFrame, Int) = {
    val local = collectBooks(codebooks)
    val m = local.length
    val nCells = local.head.length
    val dsub = local.head.head.length
    val books = codebooks.sparkSession.createDataFrame(
      for { j <- 0 until m; c <- 0 until nCells }
        yield (j, c, local(j)(c).map(_.toFloat))
    ).toDF("subspace", "cell", "center")
    val q = queries.select(col(idCol).as("q_id"), normalized(col(vecCol)).as("q_vec"))
    val tables = q.crossJoin(broadcast(books))
      .select(col("q_id"), col("q_vec"), col("subspace"), col("cell"),
        VectorFunctions.dot(
          slice(col("q_vec"), col("subspace") * dsub + 1, lit(dsub)),
          col("center")).as("dp"))
      .groupBy(col("q_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("subspace"), col("cell"), col("dp")))),
        s => s.getField("dp")).as("tbl"))
    (tables, nCells)
  }

  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      codebooks: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val (tables, nCells) = adcTables(queries, codebooks, idCol, vecCol)

    // score: sum of m table lookups per (query, code-row) — one fused
    // loop ([[graft.functions.AdcScore]]); the equivalent zip_with +
    // aggregate HOF chain measured ~20x slower at 100k x 100 pairs
    val approx = VectorFunctions.adcScore(col("tbl"), col("codes"), nCells)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_cos").desc, col("n_id").asc)
    codes.select(col(idCol).as("n_id"), col("codes"))
      .crossJoin(broadcast(tables))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), approx.as("approx_cos"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("approx_cos"), 6).as("approx_cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ADC shortlist + EXACT re-rank (the FAISS `IndexPQ` + refine recipe):
    * compressed codes prune the corpus to `shortlist` candidates per
    * query, then true cosine re-scores ONLY those rows. Quantization
    * error just has to keep real neighbors inside the shortlist, not rank
    * them — which is what lifts recall on hard (near-random) corpora
    * where raw ADC ordering is noisy.
    *
    * Scale shape: the shortlist ids are tiny (queries × shortlist) and
    * broadcast; fetching raw vectors is one semi-join-shaped probe of the
    * corpus, so exact float math touches `|queries| * shortlist` rows
    * instead of the whole corpus.
    */
  def pqTopKRefined(
      corpus: DataFrame,
      queries: DataFrame,
      codebooks: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val encoded = encode(corpus, codebooks, vecCol)
    val cands = adcTopK(encoded, queries, codebooks, idCol, vecCol, shortlist)
      .select(col("q_id"), col("n_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .join(broadcast(cands), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        VectorFunctions.cosineSim(col("q_vec"), col("n_vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** One-call convenience: fit (on a sample), encode, query. A positive
    * `shortlist` turns on the exact re-rank over that many ADC candidates.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 16,
      nCells: Int = 16,
      seed: Long = 42L,
      buildSampleFraction: Double = 1.0,
      shortlist: Int = 0): DataFrame = {
    val books = fitCodebooks(corpus, vecCol, m, nCells, seed, buildSampleFraction)
    if (shortlist > 0)
      pqTopKRefined(corpus, queries, books, idCol, vecCol, k, shortlist)
    else {
      val encoded = encode(corpus, books, vecCol)
      adcTopK(encoded, queries, books, idCol, vecCol, k)
    }
  }
}
