package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the tokenizer-training
  * step of a pretraining pipeline, run where the corpus lives instead of
  * funneling text to one machine (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Shape: classic BPE iterates over WORD COUNTS, not the raw corpus — the
  * first aggregation collapses 100 TB of text to a distinct-word table
  * (Zipf: vocab grows ~sqrt-ish of corpus), and every merge round runs
  * over that. Per round: adjacent-symbol pairs are counted weighted by
  * word frequency (map-side partial agg), ONE winning pair reaches the
  * driver (TakeOrdered of 1 row — never the counts table), and the merge
  * is applied map-only with a left-to-right fold. Lineage is cut with a
  * local checkpoint every few rounds, the same discipline as
  * [[graft.operators.ConnectedComponents]].
  *
  * Ties break deterministically (count desc, then pair lexicographically)
  * so the learned tokenizer is reproducible across runs and partitionings.
  */
object Bpe {

  /** One merge rule: `left`+`right` fuse into one symbol. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Split a word into single-character symbols. */
  private def chars(word: Column): Column =
    // split on the empty pattern yields one element per character
    filter(split(word, ""), s => s =!= "")

  /** Adjacent pairs of a symbol array as structs (l, r). Single-symbol
    * words contribute nothing (sequence(1, 0) would DESCEND, not stay
    * empty — the guard matters).
    */
  private def pairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))

  /** Left-to-right non-overlapping merge of (l, r) into l+r — the BPE
    * apply rule — as a fold over the symbol array. Words are short, so
    * the quadratic array-copy in the fold is bounded and stays codegen.
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** The distinct-word count table: (word, n). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merge rules from the corpus. Returns them in rank
    * order; the driver holds only the rules (numMerges rows), never the
    * vocabulary.
    *
    * `sampleFraction < 1` learns on a seeded document sample — the same
    * knob as [[Pq.fitCodebooks]]/[[Ivf.fitCentroids]], and the 100 TB
    * shape: each of the `numMerges` rounds scans the word-count table, so
    * learning must run on a sample (pair RANKS converge long before the
    * corpus is seen — Zipf again) while [[encode]] stays map-only over
    * everything. Seeded, so the sampled tokenizer is reproducible.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      checkpointEvery: Int = 4,
      sampleFraction: Double = 1.0,
      seed: Long = 42L): Seq[Merge] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val base =
      if (sampleFraction < 1.0)
        docs.sample(withReplacement = false, sampleFraction, seed)
      else docs
    // lazy cuts: each round's top-pair collect is a full scan that
    // materializes (and persists) the pending checkpoint in the same job
    // — eager paid a dedicated extra pass per cut (Graph.pageRank doc)
    var words = wordCounts(base, textCol)
      .select(chars(col("word")).as("syms"), col("n"))
      .localCheckpoint(false)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val top = words
        .select(explode(pairs(col("syms"))).as("p"), col("n"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val row = top.head
        val (l, rr, freq) = (row.getString(0), row.getString(1), row.getLong(2))
        learned += Merge(r, l, rr, freq)
        words = words.select(applyMerge(col("syms"), l, rr).as("syms"), col("n"))
        if ((r + 1) % checkpointEvery == 0)
          words = words.localCheckpoint(false)
        r += 1
      }
    }
    learned.toSeq
  }

  /** Learned rules as a DataFrame (rank, left, right, freq). */
  def mergesDF(
      docs: DataFrame, textCol: String, numMerges: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges, sampleFraction = sampleFraction, seed = seed)
      .toDF()
      .select(col("rank"), col("left"), col("right"), col("freq"))
      .orderBy(col("rank"))
  }

  /** Persist learned rules as a standing lake table — the tokenizer as
    * a standing artifact, the same discipline as [[Pq.saveCodebooks]] /
    * [[Ivf.saveIndex]]: merges are learned ONCE (sampled) where the
    * corpus lives, and every tokenize job afterwards loads the tiny
    * rule table instead of re-running the per-rank corpus scans.
    */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    graft.sources.LakeTable(spark, path)
      .write(merges.toDF().select(col("rank"), col("left"), col("right"), col("freq"))): Unit
  }

  /** Load a standing rule table written by [[saveMerges]], rank-ordered.
    * The collect is bounded by the rule count — a production 32k-merge
    * vocabulary is 32k tiny rows, driver-safe by construction.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    graft.sources.LakeTable(spark, path).read
      .select(col("rank"), col("left"), col("right"), col("freq"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toIndexedSeq

  /** Tokenize text with learned rules: per word, the rank-ordered merge
    * folds compose into one (deep but bounded) projection — map-only,
    * no shuffle, no per-row rule joins. Right for SMALL rule sets (the
    * expression tree grows linearly in rules and Catalyst
    * analysis/codegen with it); a production 32k-merge vocabulary needs
    * [[encodeScalable]].
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    def tokenizeWord(w: Column): Column =
      merges.sortBy(_.rank).foldLeft(chars(w)) { (acc, m) =>
        applyMerge(acc, m.left, m.right)
      }
    df.withColumn("bpe_tokens",
      flatten(transform(TextFunctions.tokens(col(textCol)), tokenizeWord(_))))
  }

  /** [[encode]] for production-sized rule sets: the whole rank table
    * rides ONE custom expression ([[graft.functions.BpeEncodeExpr]])
    * that tokenizes each word imperatively — the HuggingFace-style loop
    * fusing the LOWEST-RANK adjacent pair present until no rule applies.
    * Still map-only and shuffle-free, but the plan size is constant in
    * the rule count, and per-word cost is proportional to merges that
    * actually FIRE instead of a full pass per learned rule.
    *
    * Produces the SAME tokens as [[encode]] for rules learned by
    * [[learnMerges]]: a training-derived rule's sides always exist
    * before its rank (training applied lower ranks first), so
    * "lowest-rank pair present" fires rules in exactly the rank order
    * the per-rank folds replay (PropertySpec pins the equality).
    */
  def encodeScalable(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    df.withColumn("bpe_tokens",
      graft.functions.TextExpressions.bpeEncode(
        TextFunctions.tokens(col(textCol)),
        merges.map(m => (m.left, m.right) -> m.rank).toMap))
}
