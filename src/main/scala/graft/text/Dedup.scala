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
    pairScores(df, idCol, textCol, n, maxShingleDf)
      .select(
        col("a_id"),
        col("b_id"),
        (col("common").cast("double") /
          (col("a_sh") + col("b_sh") - col("common"))).as("jaccard")
      )
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Containment-scored near-dup pairs: |A∩B| / min(|A|,|B|) over n-gram
    * shingle sets (Broder's containment, the right metric when one doc
    * SUBSUMES another — e.g. a page wrapped in boilerplate, or a doc
    * quoted whole inside a longer one — where Jaccard is diluted by the
    * larger doc's extra shingles and misses the pair). Same inverted-index
    * pair join as the Jaccard path: bucketed by shingle, never all-pairs.
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = None
  ): DataFrame = {
    pairScores(df, idCol, textCol, n, maxShingleDf)
      .select(
        col("a_id"),
        col("b_id"),
        (col("common").cast("double") / least(col("a_sh"), col("b_sh")))
          .as("containment")
      )
      .where(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("containment"), 6).as("containment"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Shared inverted-index pair stage: (a_id, a_sh, b_id, b_sh, common)
    * for every doc pair with at least one co-occurring n-gram shingle.
    */
  private def pairScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxShingleDf: Option[Int]
  ): DataFrame = {
    // materialize tokens, then shingles, at projection boundaries — lambda
    // args re-evaluate per element, so inlining tokens(text) would re-run
    // the regex split per shingle (measured 4x on this pipeline)
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("toks"), n).as("sh"))
      .where(size(col("sh")) > 0)
    // the per-doc shingle count RIDES ALONG the exploded rows (it is
    // functionally dependent on id, so it adds nothing to the group
    // cardinality below) instead of living in a separate `sizes` table:
    // joining sizes back for each pair side re-executed the whole
    // scan+tokenize+explode subtree per join (measured: 7 Generate nodes
    // in the executed plan; with ride-along the b-side is a byte-identical
    // exchange the planner reuses)
    val exploded0 = sh.select(
      col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
    val exploded = maxShingleDf match {
      case Some(cap) =>
        val hot = exploded0.groupBy("g").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("g")
        exploded0.join(broadcast(hot), Seq("g"), "left_anti")
      case None => exploded0
    }
    // pre-partition the exploded stream by the join key: the pair join
    // needs both sides hashed by g anyway (the same exchange serves both
    // via ReuseExchange — one shuffle, not two), and WITHOUT it a small
    // scan (one parquet split) feeds the planner a broadcast join whose
    // streamed side keeps the scan's partitioning, serializing the
    // O(pairs) join+aggregate onto a single core (measured: the whole
    // 3.4 s of q_ngram_jaccard ran in one task). Keyed by g the pair
    // compute spreads across the cluster's cores at every scale; the
    // explicit count pins the CPU-bound kernel's parallelism to the
    // cores available rather than to the (tiny) byte size AQE would
    // coalesce to. Trade-off, noted: a user-specified partition count
    // (REPARTITION_BY_NUM) also opts this exchange out of AQE's
    // skew-join splitting — a pathologically hot shingle group in the
    // UNCAPPED path becomes one unsplittable O(k²) partition. Scale
    // callers with hostile corpora should use the hot-capped variant
    // (maxShingleDf), which removes the hot groups before the join —
    // a stronger fix than splitting them after the shuffle.
    val part = exploded.repartition(
      df.sparkSession.sparkContext.defaultParallelism, col("g"))
    part.as("a")
      .join(part.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(
        col("a.id").as("a_id"), col("a.n_sh").as("a_sh"),
        col("b.id").as("b_id"), col("b.n_sh").as("b_sh"))
      .agg(count(lit(1)).as("common"))
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
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("toks"), n).as("sh"))
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

  /** Native banded MinHash near-dup pairs: k = bands*rowsPerBand
    * min-hashes per doc (one custom-expression pass), band keys = hash of
    * each r-slice, candidates = docs sharing >=1 band, then EXACT jaccard
    * verification on the candidate set. AND-OR amplification
    * (p = 1-(1-j^r)^b) keeps false candidates ~0 on low-jaccard corpora,
    * where MLlib's MinHashLSH (single-hash OR-only tables, p ~ 1-(1-j)^b)
    * floods candidates. This is the 100 TB path: cost = shuffle on band
    * keys + |candidates| exact checks, never all-pairs.
    */
  def minhashBandedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      seed: Int = 42
  ): DataFrame = {
    val k = bands * rowsPerBand
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("toks"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), col("sh"),
        graft.functions.TextExpressions.minhashSignature(col("sh"), k, seed).as("sig"))
    // the band shuffle carries only (id, band, key): shipping the shingle
    // arrays through the bands-times explode would multiply shuffle volume
    // by the band factor; candidates join back to the single shingle table
    val banded = sh.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val shingleTable = sh.select(col("id"), col("sh"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
      .join(shingleTable.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(shingleTable.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
    candidates
      .withColumn("common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("a_sh")) + size(col("b_sh")) - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash from a tokens column via the custom single-pass
    * [[graft.functions.SimHash64Expr]] (a lambda-built bit-vote would
    * re-evaluate tokenization per bit — measured 14s -> sub-second on
    * sf0.1 docs).
    */
  /** Standing MinHash index over a corpus: (id, band, key, sig), one row
    * per (doc, band). New batches are deduped against this WITHOUT
    * rescanning the corpus text — the index carries everything needed for
    * both the band probe and the signature-based Jaccard estimate. Persist
    * it via [[graft.sources.LakeTable]] like any table; at 100 TB the
    * index is ~1 KB/doc (k longs × bands) vs re-shingling the whole lake
    * per incoming batch.
    */
  def buildMinhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      seed: Int = 42): DataFrame = {
    val k = bands * rowsPerBand
    df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("toks"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"),
        graft.functions.TextExpressions.minhashSignature(col("sh"), k, seed).as("sig"))
      .select(col("id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"), col("sig"))
  }

  /** Near-duplicates of an INCOMING batch against a standing index built
    * by [[buildMinhashIndex]] (same n/bands/rowsPerBand/seed — the hash
    * family must match). Candidates come from band-key collisions;
    * similarity is the signature agreement fraction, the standard
    * unbiased MinHash estimate of Jaccard — no corpus text touched.
    *
    * Scale shape: the incoming batch is small relative to the lake, so
    * its banded keys broadcast; the index side is a key-partitioned scan.
    * Returns (new_id, corpus_id, est_jaccard >= threshold).
    */
  def incrementalNearDup(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      seed: Int = 42): DataFrame = {
    val k = bands * rowsPerBand
    val probe = buildMinhashIndex(newDocs, idCol, textCol, n, bands, rowsPerBand, seed)
    val agree = aggregate(
      zip_with(col("n_sig"), col("c_sig"), (a, b) => (a === b).cast("int")),
      lit(0), (acc, x) => acc + x)
    broadcast(probe.as("p")
      .select(col("p.id").as("new_id"), col("p.band").as("band"),
        col("p.key").as("key"), col("p.sig").as("n_sig")))
      .join(index.select(col("id").as("corpus_id"), col("band"), col("key"),
        col("sig").as("c_sig")), Seq("band", "key"))
      .dropDuplicates("new_id", "corpus_id")
      .withColumn("est_jaccard", round(agree.cast("double") / k, 6))
      .where(col("est_jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("est_jaccard"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** [[incrementalNearDup]] with an EXACT verification stage — the
    * production serving shape when the audit needs true Jaccard, not the
    * signature estimate: the standing index still generates candidates
    * (band-key collisions, no corpus re-shingling for the probe), but
    * each candidate pair is then verified against the corpus TEXT with
    * exact n-gram Jaccard. Precision is 1 by construction (every output
    * pair passed the exact filter), and with the 16×2 banding the
    * candidate recall at threshold 0.7 is 1 - (1 - 0.7²)^16 ≈ 1 - 2e-5
    * per pair (planted near-dups at ~0.9 miss at ~1e-11) — the same
    * quantitative argument that lets [[minhashBandedPairs]] carry a full
    * content oracle, applied to the incremental path.
    *
    * Scale shape: the incoming batch's banded keys broadcast against the
    * index (as in [[incrementalNearDup]]); the exact stage touches
    * corpus text ONLY for candidate corpus_ids (a broadcast semi-join of
    * a candidate-sized key set into the corpus scan), so the verify cost
    * tracks |candidates|, never |corpus|.
    *
    * Returns (new_id, corpus_id, jaccard >= threshold).
    */
  def incrementalNearDupVerified(
      newDocs: DataFrame,
      index: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      seed: Int = 42): DataFrame = {
    val probe = buildMinhashIndex(newDocs, idCol, textCol, n, bands, rowsPerBand, seed)
    val cand = broadcast(probe
      .select(col("id").as("new_id"), col("band"), col("key")))
      .join(index.select(col("id").as("corpus_id"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    def shingled(d: DataFrame, idName: String, shName: String) = d
      .select(col(idCol).as(idName),
        TextFunctions.shinglesOf(TextFunctions.tokens(col(textCol)), n).as(shName))
      .where(size(col(shName)) > 0)
    val withNew = cand
      .join(shingled(newDocs, "new_id", "a_sh"), Seq("new_id"))
    // semi-join the corpus to the candidate ids BEFORE shingling: the
    // shingle projection would otherwise evaluate below the join and pay
    // O(|corpus|) tokenize+set CPU per probe batch — the cost this path
    // exists to avoid
    val candCorpus = corpus.join(
      broadcast(cand.select(col("corpus_id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
    val jac = shingled(candCorpus, "corpus_id", "b_sh")
      .join(broadcast(withNew), Seq("corpus_id"))
      .withColumn("common",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
      .withColumn("jaccard", round(
        col("common") / (size(col("a_sh")) + size(col("b_sh")) - col("common")), 6))
    jac.where(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  def simhash64Of(ts: Column): Column =
    graft.functions.TextExpressions.simhash64(ts)

  /** Convenience form over raw text; prefer [[simhash64Of]] on hot paths. */
  def simhash64(text: Column): Column = simhash64Of(TextFunctions.tokens(text))

  /** SimHash near-dup pairs with hamming distance <= maxHamming, via
    * 4x16-bit band join (a pair within hamming<=3 shares >=1 exact band).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), simhash64Of(col("toks")).as("sig"))
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

  /** [[simhashPairs]]' ENGINE-NEUTRAL twin: same bit-vote signature, same
    * band join, same hamming filter, but the per-token hash is the first
    * 60 bits of md5 instead of Spark's internal Murmur3_x86_32 — md5 is
    * bit-identical in every engine, so the whole signature arithmetic
    * (and therefore the exact pair set) is reproducible in plain SQL and
    * the query carries a full hash oracle. The murmur variant stays the
    * hot-path choice (one 32-bit mix vs a crypto digest per token); this
    * one is the verification surface. 60 bits (15 hex chars) rather than
    * 64 keep the signature inside a SIGNED long in both engines — a
    * 4-bit haircut costs nothing at these hamming radii.
    *
    * Exactness (the q_minhash_neardup precision-1 argument, stronger
    * here): output = ALL pairs at hamming <= `maxHamming` — precision 1
    * because hamming is checked directly, recall 1 by pigeonhole: with 4
    * bands of 15 bits, <= 3 differing bits touch at most 3 bands, so at
    * least one band matches exactly and banding loses NOTHING (unlike
    * MinHash banding, which is probabilistic). For maxHamming > 3 the
    * guarantee needs maxHamming+1 bands; enforced below.
    *
    * Signature is a map-only nested-HOF fold (no explode, no shuffle
    * before the band join); the join explodes 4 rows per doc — the same
    * scale shape as the murmur path.
    */
  def simhashMd5Pairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int
  ): DataFrame = {
    require(maxHamming <= 3,
      s"4 bands of 15 bits guarantee recall only through hamming 3, got $maxHamming")
    // one compiled pass per row (graft.functions.SimHash60Md5Expr) —
    // the identical md5-60 arithmetic the DuckDB oracle recomputes; the
    // equivalent nested transform/aggregate/zip_with HOF spelling costs
    // ~60 interpreted lambda frames per token (12x slower on the bench)
    // and is pinned equal in DedupSpec
    val sh = df
      .select(col(idCol).as("id"),
        graft.functions.TextExpressions.simhash60Md5(
          TextFunctions.tokens(col(textCol))).as("sig"))
    val bands = sh.select(
      col("id"),
      col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * 15).bitwiseAND(0x7FFFL).as("v"))
      }: _*)).as("bv")
    ).select(col("id"), col("sig"), col("bv.band"), col("bv.v"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("bigint").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding cosine near-dup: random-hyperplane LSH buckets (seeded) then
    * exact cosine refine inside each bucket. Sub-quadratic at scale; recall
    * measured vs brute force in SimilaritySpec.
    *
    * `nPlanes = None` (the default) derives the plane count from the corpus
    * size: ~log2(n / targetBucketSize), clamped to [4, 24]. A FIXED plane
    * count caps the bucket count, so bucket population — and the O(pop²)
    * within-bucket pairing — grows linearly with the corpus; scaling planes
    * with log(n) keeps expected bucket size ~targetBucketSize at any n.
    *
    * Deriving the count runs `df.count()` at CALL time — cheap for a bare
    * parquet scan, but a full re-execution for a derived input plan. Pass
    * `corpusSizeHint` (an estimate within 2x is fine — only its log2
    * matters) or an explicit `nPlanes` to keep the call fully lazy. For
    * corpora where even log-scaled hyperplanes recall too little, [[Ivf]]
    * is the coarse-quantizer alternative.
    */
  /** Hyperplane count for a corpus of n vectors: 2^planes buckets sized
    * ~targetBucketSize on average. Clamped to [4, 24]: fewer than 4 planes
    * degenerates to near-all-pairs; beyond 24 (16M buckets) recall loss
    * outweighs pruning and IVF routing is the better tool.
    */
  def adaptivePlaneCount(n: Long, targetBucketSize: Long = 1024L): Int = {
    val raw = math.ceil(
      math.log(math.max(n.toDouble / targetBucketSize, 1.0)) / math.log(2.0)).toInt
    math.min(math.max(raw, 4), 24)
  }

  /** Cluster count for SemDeDup over n embeddings: n / targetBlockSize
    * clusters keep each within-cluster O(block²) pairing bounded at any
    * corpus size (the [[semanticDedup]] analogue of
    * [[adaptivePlaneCount]]). Floor 16 so small corpora still block;
    * cap 1M — beyond that the k-means fit itself needs a coarser
    * hierarchy and the caller should shard first.
    */
  def adaptiveClusterCount(n: Long, targetBlockSize: Long = 4096L): Int =
    math.min(math.max(16L, n / math.max(targetBlockSize, 1L)), 1L << 20).toInt

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    * semantic deduplication by CLUSTER-SCOPED pairwise cosine. K-means
    * clusters the embedding space (sampled fit, the same quantizer
    * [[graft.text.Ivf]] uses, map-only assignment), then pairwise
    * similarity is computed ONLY within each cluster — the paper's own
    * scale trick, turning all-pairs O(n²) into k independent O((n/k)²)
    * blocks that parallelize by cluster. Pairs at or above `eps` are
    * semantic duplicates; duplicate GROUPS (connected components over
    * the pair graph, same O(diameter) min-label propagation as
    * [[clusters]]-style dedup) keep their min-id representative.
    *
    * Returns (id, cell, component, keep): every input doc, its cluster,
    * its duplicate-group id (own id when unique), and whether it
    * survives — callers `where(col("keep"))`.
    *
    * The paper's documented trade-off applies: a duplicate pair split
    * across a cluster boundary is missed. Raise `nClusters` for
    * throughput (smaller blocks), lower it for recall.
    *
    * `nClusters <= 0` (the default) picks k ADAPTIVELY as
    * [[adaptiveClusterCount]] — k grows with the corpus so the
    * within-cluster O(block²) pairing stays bounded at any scale (a
    * FIXED k at 100 TB sends the blocks quadratic); deriving n runs
    * `df.count()` at call time, so pass `corpusSizeHint` (within 2x is
    * fine) to keep the call fully lazy on a derived input plan.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 0,
      eps: Double = 0.97,
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0,
      targetBlockSize: Long = 4096L,
      corpusSizeHint: Option[Long] = None
  ): DataFrame = {
    val k =
      if (nClusters > 0) nClusters
      else adaptiveClusterCount(
        corpusSizeHint.getOrElse(df.count()), targetBlockSize)
    val centers = Ivf.fitCentroids(df, vecCol, k, seed, fitSampleFraction)
    val assigned = Ivf.assignCells(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")),
      centers, "v")
    // within-cluster pairs only: the equi-join on cell IS the blocking
    val pairs = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .where(VectorFunctions.cosineSim(col("a.v"), col("b.v")) >= eps)
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    val comps = graft.operators.ConnectedComponents.components(pairs)
    assigned.select(col("id"), col("cell"))
      .join(comps.withColumnRenamed("node", "id"), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("component"), col("id")).as("component"))
      .withColumn("keep", col("id") === col("component"))
  }

  /** OR-banded hyperplane LSH near-dup (the AND-OR construction MinHash
    * uses, in cosine space): `bands` independent hyperplane tables of
    * `planesPerBand` planes each; a pair becomes a candidate when ANY
    * band's full bucket hash matches, and candidates pass through the
    * EXACT cosine filter — so precision is 1 by construction and the
    * banding is purely the recall dial. A pair at cosine similarity c
    * survives one band with probability s^r (s = 1 - arccos(c)/π), so
    * the candidate probability is 1 - (1 - s^r)^b: at the fixture's
    * (b=32, r=2) and threshold 0.4 (s = 0.631) the per-pair miss is
    * (1 - 0.631²)^32 ≈ 9e-8 — the banded output IS the exact all-pairs
    * set at any practical corpus size, which is what lets the declared
    * query carry a full content oracle (and the planes are seeded, so
    * the pair set is deterministic, not merely high-probability).
    *
    * The r/b pair is the scale dial: r bounds bucket sizes (2^r buckets
    * per band — at 100 TB raise r so buckets stay ~n/2^r bounded, and
    * raise b to hold the recall target per the closed form above); the
    * single-band adaptive variant ([[embeddingNearDup]]) is the
    * max-pruning end of the same curve.
    */
  def embeddingNearDupBanded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      bands: Int,
      planesPerBand: Int,
      seed: Long = 42L
  ): DataFrame = {
    require(bands >= 1 && planesPerBand >= 1,
      "embeddingNearDupBanded needs bands >= 1 and planesPerBand >= 1")
    val rnd = new scala.util.Random(seed)
    val planeTables: Seq[Seq[Seq[Double]]] =
      Seq.fill(bands)(Seq.fill(planesPerBand)(Seq.fill(dim)(rnd.nextGaussian())))
    val bucketed = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(VectorFunctions.hyperplaneBuckets(col(vecCol), planeTables))
          .as(Seq("band", "bucket")))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.v").as("av"), col("b.v").as("bv"))
      // a pair colliding in several bands must verify once, not b times
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        VectorFunctions.cosineSim(col("av"), col("bv")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nPlanes: Option[Int] = None,
      targetBucketSize: Long = 1024L,
      corpusSizeHint: Option[Long] = None,
      seed: Long = 42L
  ): DataFrame = {
    val planeCount = nPlanes.getOrElse(adaptivePlaneCount(
      corpusSizeHint.getOrElse(df.count()), targetBucketSize))
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(planeCount, dim)(rnd.nextGaussian())
    // single-table fused bucket hash (see graft.functions.HyperplaneBuckets
    // — per-plane composed columns drop out of codegen as planes grow)
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.hyperplaneBuckets(
        col(vecCol), Seq(planes.map(_.toSeq).toSeq)).getItem(0).as("bucket"))
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
