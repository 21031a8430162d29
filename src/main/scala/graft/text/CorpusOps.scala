package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-preparation operators a pretraining-data pipeline runs between
  * filtering and writing shards: language-model quality scoring, in-document
  * repetition removal, and reproducible global example ordering. All three
  * are fully deterministic, so each is DuckDB-oracle-matched (the sampled /
  * scored / reordered rows themselves, not just counts).
  */
object CorpusOps {

  type Q = (SparkSession, String) => DataFrame

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Unigram language-model quality score (the CCNet-style perplexity
    * filter, with the corpus's own unigram distribution standing in for
    * the external KenLM): mean token log-probability under unigram
    * frequencies, plus the perplexity `exp(-mean)`. Low-probability token
    * soup scores high-perplexity and gets filtered.
    *
    * Scale shape: two corpus scans by construction (a model-then-score
    * pipeline). Scan 1 builds the unigram table — map-side partial
    * aggregation collapses it to vocab size, which is small and
    * broadcast. Scan 2 explodes tokens, broadcast-joins the model (no
    * corpus shuffle), and the per-doc aggregate is the only exchange.
    */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir).documents
    val tok = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .where(col("tok") =!= "")
    val counts = tok.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("n"))
    // total token count as a 1-row broadcast (TfIdf-style), never a
    // driver collect
    val total = counts.agg(sum(col("n")).as("total"))
    tok
      .join(broadcast(counts), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("n") / col("total"))), 4).as("mean_logprob"),
        round(exp(-avg(log(col("n") / col("total")))), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model quality score — the next step up from
    * [[unigramLogprob]]'s unigram filter (repetitive templated text can
    * look fine unigram-wise but shows up in transition probabilities):
    * mean log-probability of each document's token TRANSITIONS under the
    * corpus's own add-one-smoothed bigram model,
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).
    *
    * Scale shape: same model-then-score pipeline as the unigram. Bigrams
    * come from ONE projection per scan (element_at pairs over the split
    * array — no token explode + self-join at corpus scale); the model
    * tables collapse to vocab-sized frames broadcast into the scoring
    * join, so the corpus never shuffles; the per-doc aggregate is the
    * only exchange.
    */
  def bigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    // NOT spread: the bigram projection is one transform per doc and the
    // model/score joins shuffle vocab-sized frames — the 3-pass bench
    // showed the spread exchange as a loss (1.98 -> 2.22 s), and the
    // 8-core scaling ratio (0.71) flagged the 32-way exchange overhead
    val docs = Tables(spark, sfDir).documents
    def bigrams(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), toks(col("text")).as("ts"))
      // A 0-or-1-token doc has no transitions; without this guard
      // sequence(1, 0) steps DOWNWARD to [1, 0] and element_at(ts, 0)
      // throws INVALID_INDEX_OF_ZERO at runtime.
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
    val bg = bigrams(docs)
    val cnt = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c"))
    val ctx = cnt.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    // vocabulary size as a 1-row broadcast, never a driver collect
    val vocab = docs
      .select(explode(toks(col("text"))).as("tok")).where(col("tok") =!= "")
      .agg(count_distinct(col("tok")).cast("double").as("v"))
    val p = log((col("c") + 1) / (col("c1") + col("v")))
    bg
      .join(broadcast(cnt), Seq("w1", "w2"))
      .join(broadcast(ctx), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(p), 4).as("mean_logprob"),
        round(exp(-avg(p)), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** In-document repetition removal: keep each token's FIRST occurrence,
    * preserving original order — the word-granularity analogue of C4's
    * duplicate-line drop (this corpus has no line structure). Emits
    * before/after token counts and the md5 of the rebuilt text so the
    * transform itself (not just its size) is oracle-checked.
    *
    * Scale shape: MAP-ONLY. The dedup is one pass per row
    * ([[graft.functions.FirstOccurrenceTokensExpr]] — a LinkedHashSet in
    * plain JVM code), so no (doc, token) shuffle and no per-group
    * collect exist at all; the only exchange is the output ordering. The
    * DuckDB oracle reconstructs the identical values relationally
    * (unnest + min(pos) + ordered string_agg).
    */
  def docTokenDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    val dedup = graft.functions.TextExpressions.firstOccurrenceTokens(t)
    Tables(spark, sfDir).documents
      .select(
        col("doc_id"),
        size(t).cast("bigint").as("n_tokens"),
        size(dedup).cast("bigint").as("n_uniq"),
        md5(array_join(dedup, " ")).as("dedup_hash"))
      .orderBy(col("doc_id"))
  }

  /** Reproducible global shuffle for training-example ordering: a seeded
    * md5 shuffle key gives every run (and every engine) the SAME
    * pseudo-random permutation, plus a deterministic shard assignment
    * from the key's leading byte.
    *
    * Scale shape: writing shards ordered by `skey` is
    * `repartitionByRange(skey) + sortWithinPartitions` — a total order
    * across output files WITHOUT a global row-number window (which would
    * serialize on one partition). The oracle checks the permutation via
    * ORDER BY skey; no rank column is materialized for exactly that
    * reason.
    */
  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents
      .select(
        md5(concat(lit("graft-shuffle-42:"), col("doc_id").cast("string")))
          .as("skey"),
        col("doc_id"))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 2), 16, 10).cast("int") % 8).cast("int"))
      .orderBy(col("skey"))

  /** Cross-document duplicated-SPAN removal (the exact-substring dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022, at n-gram granularity): every occurrence of an
    * 8-token gram that already appeared earlier in the corpus (global
    * (doc_id, pos) order) marks its 8 token positions as duplicated; the
    * cleaned text drops those positions, and the FIRST occurrence
    * corpus-wide survives. Emits per-doc token counts, duplicated-position
    * counts, and the md5 of the cleaned text — the transform itself is
    * oracle-checked.
    *
    * Scale shape: the gram table is the inverted-index shuffle (key =
    * gram) every near-dup path here uses; the first-occurrence rank is a
    * window per gram, position expansion is a bounded explode (n per
    * duplicate), and the rebuild joins positions per doc — no all-pairs
    * product anywhere.
    */
  def spanDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    val covered = coveredPositions(docs, "doc_id", "text", n = 8)
    rebuildWithout(docs, covered, "n_dup_positions")
  }

  /** Token positions (1-based) covered by a duplicated n-gram occurrence —
    * the position-granularity core shared by [[spanDedup]] and
    * [[duplicatedSpans]]. The corpus-wide FIRST occurrence of each gram
    * (global (doc, pos) order) is never covered.
    *
    * Skew: the default path ranks occurrences with a per-gram window —
    * MEASURED fastest skew-free (7.1 s vs 11.9 s for the agg+join shape
    * at the 10x probe), but a window partition cannot be split, so a
    * boilerplate gram occurring a billion times (license headers,
    * navigation chrome) pins one straggler task at 100 TB. `hotGramDf`
    * routes around that, in the same spirit as
    * [[Dedup.ngramJaccardPairs]]'s `maxShingleDf`: one partial-combined
    * stats pass finds grams with df above the cap (a tiny, broadcastable
    * set by construction) AND their global first occurrence; hot grams
    * take the closed form "every occurrence except the minimum" via a
    * broadcast join (skew-immune, no window), cold grams take the window
    * as usual. Output is IDENTICAL for any cap — only the plan changes.
    */
  def coveredPositions(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      hotGramDf: Option[Int] = None): DataFrame = {
    val withToks = docs.select(col(idCol), toks(col(textCol)).as("ts"))
    // (doc, 1-based pos, gram text) for every n-window
    val grams = withToks
      .where(size(col("ts")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("ts")) - (n - 1)),
        i => struct(i.as("pos"),
          array_join(slice(col("ts"), i, lit(n)), " ").as("gram")))).as("g"))
      .select(col(idCol), col("g.pos"), col("g.gram"))
    val w = Window.partitionBy(col("gram"))
      .orderBy(col(idCol).asc, col("pos").asc)
    def expand(dups: DataFrame): DataFrame = dups
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    hotGramDf match {
      case None =>
        expand(grams.withColumn("rk", row_number().over(w)).where(col("rk") > 1))
      case Some(cap) =>
        // the gram table feeds three branches (stats, cold window, hot
        // join) — materialize it once instead of re-deriving the explode
        // per branch (remeasured: 26.8 s -> see BASELINE.md)
        val mat = grams.localCheckpoint(true)
        // min(struct) ordering is lexicographic (doc, then pos) — the
        // same order the window ranks by
        val hot = mat.groupBy(col("gram"))
          .agg(count(lit(1)).as("df"),
            min(struct(col(idCol), col("pos"))).as("first"))
          .where(col("df") > cap)
          .localCheckpoint(true)
        val coldDups = mat
          .join(broadcast(hot.select(col("gram"))), Seq("gram"), "left_anti")
          .withColumn("rk", row_number().over(w)).where(col("rk") > 1)
        val hotDups = mat
          .join(broadcast(hot), Seq("gram"))
          .where(col(idCol) =!= col("first")(idCol) || col("pos") =!= col("first.pos"))
        expand(coldDups.select(col(idCol), col("pos"))
          .unionByName(hotDups.select(col(idCol), col("pos"))))
    }
  }

  /** MAXIMAL duplicated spans, the ACL'22 excision unit: adjacent covered
    * positions merge gaps-and-islands style (p - row_number() is constant
    * within a contiguous run) and only spans of at least `minLength`
    * tokens survive — short incidental n-gram repeats (idiom, named
    * entities) are NOT excised, matching the paper's length-thresholded
    * recipe (Lee et al. use 50 BPE tokens). Returns
    * (idCol, span_start, span_end, span_len).
    *
    * Scale shape: one window per doc over COVERED positions only (a small
    * fraction of the corpus), after the inverted-index gram shuffle.
    */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, minLength: Int): DataFrame = {
    val covered = coveredPositions(docs, idCol, textCol, n)
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("p").asc)
    covered
      .withColumn("grp", col("p") - row_number().over(wDoc))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("p")).as("span_start"), max(col("p")).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .where(col("span_len") >= minLength)
      .select(col(idCol), col("span_start"), col("span_end"), col("span_len"))
  }

  /** Rebuild each doc without the given (doc, p) positions; emits token
    * counts, removed-position count (as `removedCol`), and the md5 of the
    * rebuilt text so the transform content is oracle-checkable.
    */
  private def rebuildWithout(
      docs: DataFrame, remove: DataFrame, removedCol: String): DataFrame = {
    val positions = docs.select(col("doc_id"), toks(col("text")).as("ts"))
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("p"), col("tok"))
    positions
      .join(remove.withColumn("dup", lit(true)), Seq("doc_id", "p"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("dup")).as(removedCol),
        md5(array_join(transform(
          sort_array(collect_list(when(!coalesce(col("dup"), lit(false)),
            struct(col("p"), col("tok"))))),
          s => s.getField("tok")), " ")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  /** Length-thresholded span excision as a declared query: 8-gram
    * duplicate detection, spans merged and cut only at >= 16 tokens —
    * [[spanDedup]]'s paper-faithful sibling (it cuts every covered
    * position; this one cuts only long spans and reports how many).
    */
  def spanDedupSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    val spans = duplicatedSpans(docs, "doc_id", "text", n = 8, minLength = 16)
    val spanCount = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    val cut = spans.select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("p"))
    rebuildWithout(docs, cut, "n_cut_positions")
      .join(spanCount, Seq("doc_id"), "left")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("n_cut_positions"), col("clean_hash"))
      .orderBy(col("doc_id"))
  }

  /** Token-window document chunking (the RAG / context-window prep
    * primitive): split each document into `size`-token chunks starting
    * every `size - overlap` tokens, so consecutive chunks share
    * `overlap` tokens and no token is lost. Pure expression work —
    * `slice` over the token array under an exploded chunk index — so the
    * corpus never shuffles and the explosion is bounded by
    * ceil(tokens/stride) rows per document.
    */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = docs.select(
      col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
    // chunks start at i*stride for i in [0, nChunks); the last chunk
    // covers the tail (possibly shorter than `size`)
    val n = size_(col("toks"))
    val nChunks = greatest(
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    toks
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(
        col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(size)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size_(col("chunk")).cast("bigint").as("n_tokens"),
        element_at(col("chunk"), 1).as("first_tok"),
        element_at(col("chunk"), -1).as("last_tok"))
  }

  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  def qDocChunks(spark: SparkSession, sfDir: String): DataFrame =
    chunkDocuments(graft.core.Tables(spark, sfDir).documents,
      "doc_id", "text", size = 50, overlap = 10)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** PMI collocation extraction: the top token bigrams by pointwise
    * mutual information log(p(a,b) / (p(a)·p(b))) with marginals taken
    * over bigram first/second positions — the classic phrase-mining /
    * tokenizer-seeding signal (multi-word expressions score high because
    * they co-occur far above chance). A minimum support of 5 keeps the
    * estimator out of the hapax noise floor. Scale shape: one bigram
    * aggregate (the only corpus-sized shuffle), two vocabulary-sized
    * marginal rollups joined back on the bigram table, and a 1-row total
    * broadcast; the count arithmetic stays exact in doubles (products
    * ≪ 2^53) so both engines feed log() the identical value.
    */
  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    val bg = docs
      .select(col("doc_id"), toks(col("text")).as("ts"))
      // Same sequence(1, 0)-descends guard as [[bigramLogprob]]: a
      // single-token doc would otherwise crash the whole query.
      .where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
    val cnt = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val left = cnt.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
    val right = cnt.groupBy(col("w2")).agg(sum(col("n_ab")).as("n_b"))
    val total = cnt.agg(sum(col("n_ab")).as("n_tot"))
    cnt.where(col("n_ab") >= 5)
      .join(left, "w1")
      .join(right, "w2")
      .crossJoin(broadcast(total))
      .select(
        col("w1"), col("w2"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("n_tot") /
          (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(25)
  }

  /** Cross-document LINE-level dedup (the C4 / CCNet boilerplate pass:
    * drop every occurrence of a line that appears in `maxDf` or more
    * distinct documents — navigation chrome, license headers, cookie
    * banners). This corpus has no newline structure, so a "line" is a
    * fixed `lineWidth`-token chunk — the operator's shape (hash the
    * line, count document frequency, excise hot lines, rebuild) is
    * unchanged. Distinct from [[spanDedup]]: spans excise REPEATED
    * n-gram windows keeping the first occurrence; this drops ALL copies
    * of corpus-frequent lines, first included — the C4 recipe for
    * boilerplate, where no occurrence is worth keeping.
    *
    * Scale shape: the explode is bounded at tokens/lineWidth rows per
    * doc; the line-frequency aggregate partially combines map-side and
    * only lines at/above the df threshold survive it (the "hot" set —
    * tiny relative to the corpus by the boilerplate assumption, exactly
    * like [[coveredPositions]]'s hotGramDf set), so the join back is
    * AQE-broadcastable; the per-doc rebuild is the only corpus-sized
    * shuffle.
    */
  def dedupLines(
      docs: DataFrame, idCol: String, textCol: String,
      lineWidth: Int, maxDf: Int): DataFrame = {
    require(lineWidth > 0 && maxDf >= 2, s"need lineWidth>0, maxDf>=2")
    val withToks = docs.select(col(idCol), toks(col(textCol)).as("ts"))
    val nLines = greatest(
      ceil(size_(col("ts")).cast("double") / lineWidth).cast("int"), lit(1))
    val lines = withToks
      .withColumn("i", explode(sequence(lit(0), nLines - 1)))
      .select(col(idCol), col("i"),
        array_join(slice(col("ts"), col("i") * lineWidth + 1, lit(lineWidth)), " ")
          .as("line"))
    val hot = lines
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("line_df"))
      .where(col("line_df") >= maxDf)
      .select(col("line"), lit(true).as("dup"))
    lines
      .join(hot, Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("dup").isNull, 1)).as("n_kept"),
        md5(coalesce(array_join(transform(
          sort_array(collect_list(when(col("dup").isNull,
            struct(col("i"), col("line"))))),
          s => s.getField("line")), " "), lit(""))).as("clean_hash"))
      .orderBy(col(idCol))
  }

  def qLineDedup(spark: SparkSession, sfDir: String): DataFrame =
    // NOT spread: the line explode shuffles by line hash immediately, so
    // the extra exchange measured as a net loss here
    dedupLines(Tables(spark, sfDir).documents, "doc_id", "text",
      lineWidth = 8, maxDf = 2)

  /** Gopher-style REPETITION signals (Rae et al. 2021 §A1.1 — the
    * repetition family, complementing [[graft.text.TextQueries]]'s
    * q_gopher_quality which carries the length/symbol/rep3 family):
    * top-word mass, duplicate-line fraction, and the fraction of
    * CHARACTERS inside duplicated lines (the paper thresholds the char
    * fraction, not the line count, so one giant repeated paragraph
    * can't hide behind many unique short lines). Lines are 2-token
    * chunks in the [[dedupLines]] sense (the corpus has no newlines,
    * and its generated word soup repeats 2-token runs naturally but
    * longer ones almost never — 2 keeps every signal branch live).
    *
    * Scale shape: MAP-ONLY — every signal is array arithmetic over the
    * doc's own tokens (nested higher-order functions, all codegen
    * built-ins), so the corpus never shuffles; the only exchange is the
    * output ordering. The per-doc work is O(words · distinct-words),
    * bounded by document length, not corpus size.
    */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame =
    repetitionSignalsFor(Tables.spreadScan(Tables(spark, sfDir).documents), lineWidth = 2)

  def repetitionSignalsFor(docs: DataFrame, lineWidth: Int): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("ts"))
      .withColumn("lines", expr(
        s"transform(sequence(0, greatest(cast(ceil(size(ts) / ${lineWidth}.0d) as int), 1) - 1), " +
          s"i -> array_join(slice(ts, i * $lineWidth + 1, $lineWidth), ' '))"))
      .select(
        col("doc_id"),
        size_(col("ts")).cast("bigint").as("n_words"),
        round(
          expr("array_max(transform(array_distinct(ts), " +
            "w -> size(filter(ts, x -> x = w))))").cast("double")
            / size_(col("ts")), 6).as("top_word_frac"),
        round(
          lit(1.0) - size_(array_distinct(col("lines"))).cast("double")
            / size_(col("lines")), 6).as("dup_line_frac"),
        round(
          expr("aggregate(lines, 0L, (acc, l) -> acc + " +
            "CASE WHEN size(filter(lines, x -> x = l)) > 1 " +
            "THEN cast(length(l) as bigint) ELSE 0L END)").cast("double")
            / greatest(
              expr("aggregate(lines, 0L, (acc, l) -> acc + cast(length(l) as bigint))"),
              lit(1L)), 6).as("dup_line_char_frac"))
      .orderBy(col("doc_id"))

  /** Per-document word-distribution Shannon entropy — the "token soup vs
    * natural text" diversity signal (low entropy = one token repeated,
    * high = uniform soup; real prose sits between). `norm_entropy`
    * divides by the maximum ln(n_uniq) so documents of different
    * vocabulary sizes are comparable (0 for single-word docs, where the
    * maximum is 0).
    *
    * Scale shape: MAP-ONLY like [[repetitionSignals]] — probabilities
    * and the entropy fold are array expressions over each row. The fold
    * runs over the SORTED distinct-word array, so both engines sum the
    * identical term sequence and round(…, 6) has no float-order residue
    * to absorb.
    */
  def wordEntropy(spark: SparkSession, sfDir: String): DataFrame =
    wordEntropyFor(Tables.spreadScan(Tables(spark, sfDir).documents))

  def wordEntropyFor(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("ts"))
      .withColumn("ps", expr(
        "transform(array_sort(array_distinct(ts)), " +
          "w -> size(filter(ts, x -> x = w)) / cast(size(ts) as double))"))
      // `+ 0.0` collapses IEEE -0.0 (a negated zero sum on a
      // single-word doc) to +0.0 so both engines hash identically
      .withColumn("h", expr(
        "-aggregate(ps, 0.0d, (acc, p) -> acc + p * ln(p)) + 0.0d"))
      .select(
        col("doc_id"),
        size_(col("ps")).cast("bigint").as("n_uniq"),
        round(col("h"), 6).as("entropy"),
        round(when(size_(col("ps")) > 1,
          col("h") / log(size_(col("ps")).cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"))
      .orderBy(col("doc_id"))

  def queries: Map[String, Q] = Map(
    "q_line_dedup" -> (qLineDedup _),
    "q_repetition_signals" -> (repetitionSignals _),
    "q_word_entropy" -> (wordEntropy _),
    "q_pmi_collocations" -> (pmiCollocations _),
    "q_doc_chunks" -> (qDocChunks _),
    "q_unigram_logprob" -> (unigramLogprob _),
    "q_bigram_logprob" -> (bigramLogprob _),
    "q_doc_token_dedup" -> (docTokenDedup _),
    "q_corpus_shuffle" -> (corpusShuffle _),
    "q_span_dedup" -> (spanDedup _),
    "q_span_dedup_spans" -> (spanDedupSpans _)
  )

  def oracles: Map[String, String] = Map(
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |x AS (SELECT doc_id, ts,
        |        greatest(CAST(ceil(len(ts) / 8.0) AS INT), 1) AS nc FROM t),
        |l AS (SELECT doc_id, i, array_to_string(ts[i*8+1:(i+1)*8], ' ') AS line
        |      FROM (SELECT doc_id, ts, unnest(generate_series(0, nc - 1)) AS i FROM x)),
        |hot AS (SELECT line FROM (
        |          SELECT line, count(DISTINCT doc_id) AS d FROM l GROUP BY line)
        |        WHERE d >= 2)
        |SELECT l.doc_id, count(*) AS n_lines,
        |  count(CASE WHEN h.line IS NULL THEN 1 END) AS n_kept,
        |  md5(coalesce(
        |    string_agg(CASE WHEN h.line IS NULL THEN l.line END, ' ' ORDER BY l.i),
        |    '')) AS clean_hash
        |FROM l LEFT JOIN hot h ON l.line = h.line
        |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,
    "q_repetition_signals" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |x AS (SELECT doc_id, ts,
        |  list_transform(
        |    generate_series(0, greatest(CAST(ceil(len(ts) / 2.0) AS INT), 1) - 1),
        |    i -> array_to_string(ts[i*2+1:(i+1)*2], ' ')) AS lines
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(ts) AS BIGINT) AS n_words,
        |  round(list_max(list_transform(list_distinct(ts),
        |          w -> len(list_filter(ts, x -> x = w))))::DOUBLE / len(ts), 6)
        |    AS top_word_frac,
        |  round(1.0 - len(list_distinct(lines))::DOUBLE / len(lines), 6)
        |    AS dup_line_frac,
        |  round(list_sum(list_transform(lines,
        |          l -> CASE WHEN len(list_filter(lines, x -> x = l)) > 1
        |               THEN length(l) ELSE 0 END))::DOUBLE
        |        / greatest(list_sum(list_transform(lines, l -> length(l))), 1), 6)
        |    AS dup_line_char_frac
        |FROM x ORDER BY doc_id""".stripMargin,
    "q_word_entropy" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |x AS (SELECT doc_id,
        |  list_transform(list_sort(list_distinct(ts)),
        |    w -> len(list_filter(ts, y -> y = w)) / len(ts)::DOUBLE) AS ps
        |  FROM t),
        |h AS (SELECT doc_id, ps,
        |  -coalesce(list_sum(list_transform(ps, p -> p * ln(p))), 0.0) + 0.0 AS ent
        |  FROM x)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_uniq,
        |  round(ent, 6) AS entropy,
        |  round(CASE WHEN len(ps) > 1 THEN ent / ln(len(ps)::DOUBLE)
        |        ELSE 0.0 END, 6) AS norm_entropy
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_pmi_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t)
        |       WHERE ts[i] <> '' AND ts[i + 1] <> ''),
        |cnt AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
        |l AS (SELECT w1, sum(n_ab) AS n_a FROM cnt GROUP BY 1),
        |r AS (SELECT w2, sum(n_ab) AS n_b FROM cnt GROUP BY 1),
        |tot AS (SELECT sum(n_ab) AS n_tot FROM cnt)
        |SELECT w1, w2, n_ab,
        | round(ln(n_ab::DOUBLE * n_tot / (n_a::DOUBLE * n_b)), 6) AS pmi
        |FROM cnt JOIN l USING (w1) JOIN r USING (w2), tot
        |WHERE n_ab >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 25""".stripMargin,
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |           FROM documents),
        |x AS (SELECT doc_id, ts, len(ts) AS n,
        |        greatest(CAST(ceil((len(ts) - 10) / 40.0) AS INT), 1) AS nc FROM t),
        |c AS (SELECT doc_id, ts, n, unnest(generate_series(0, nc - 1)) AS i FROM x)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(least(50, n - i * 40) AS BIGINT) AS n_tokens,
        |  ts[i * 40 + 1] AS first_tok,
        |  ts[least(i * 40 + 50, n)] AS last_tok
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t)
        |  WHERE ts[i] <> '' AND ts[i + 1] <> ''),
        |cnt AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM bg GROUP BY w1, w2),
        |ctx AS (SELECT w1, sum(c) AS c1 FROM cnt GROUP BY w1),
        |vocab AS (
        |  SELECT count(DISTINCT tok)::DOUBLE AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '')
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(ln((c + 1) / (c1 + v))), 4) AS mean_logprob,
        |  round(exp(-avg(ln((c + 1) / (c1 + v)))), 2) AS ppl
        |FROM bg JOIN cnt USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |nonempty AS (SELECT * FROM toks WHERE tok <> ''),
        |cnt AS (SELECT tok, count(*)::DOUBLE AS n FROM nonempty GROUP BY tok),
        |tot AS (SELECT sum(n) AS total FROM cnt)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(n / total)), 4) AS mean_logprob,
        |  round(exp(-avg(ln(n / total))), 2) AS ppl
        |FROM nonempty JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_doc_token_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |firsts AS (
        |  SELECT doc_id, tok, min(pos) AS p, count(*) AS reps
        |  FROM toks GROUP BY doc_id, tok)
        |SELECT doc_id, sum(reps)::BIGINT AS n_tokens, count(*)::BIGINT AS n_uniq,
        |  md5(string_agg(tok, ' ' ORDER BY p)) AS dedup_hash
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT md5('graft-shuffle-42:' || doc_id::VARCHAR) AS skey, doc_id,
        |  (('0x' || substring(md5('graft-shuffle-42:' || doc_id::VARCHAR), 1, 2))::INT % 8)::INT AS shard
        |FROM documents ORDER BY skey""".stripMargin,
    "q_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p FROM t),
        |grams AS (
        |  SELECT doc_id, unnest(gs) AS pos,
        |    unnest(list_transform(gs, i -> array_to_string(ts[i:i+7], ' '))) AS gram
        |  FROM (SELECT doc_id, ts, generate_series(1, len(ts) - 7) AS gs
        |        FROM t WHERE len(ts) >= 8)),
        |dups AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
        |    FROM grams) WHERE rk > 1),
        |covered AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p FROM dups))
        |SELECT tk.doc_id, count(*) AS n_tokens,
        |  count(c.p) AS n_dup_positions,
        |  md5(coalesce(
        |    string_agg(CASE WHEN c.p IS NULL THEN tk.tok END, ' ' ORDER BY tk.p),
        |    '')) AS clean_hash
        |FROM toks tk LEFT JOIN covered c
        |  ON tk.doc_id = c.doc_id AND tk.p = c.p
        |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin,
    "q_span_dedup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p FROM t),
        |grams AS (
        |  SELECT doc_id, unnest(gs) AS pos,
        |    unnest(list_transform(gs, i -> array_to_string(ts[i:i+7], ' '))) AS gram
        |  FROM (SELECT doc_id, ts, generate_series(1, len(ts) - 7) AS gs
        |        FROM t WHERE len(ts) >= 8)),
        |dups AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
        |    FROM grams) WHERE rk > 1),
        |covered AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p FROM dups)),
        |islands AS (
        |  SELECT doc_id, p,
        |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |  FROM covered),
        |spans AS (
        |  SELECT doc_id, min(p) AS s, max(p) AS e
        |  FROM islands GROUP BY doc_id, grp),
        |long_spans AS (SELECT * FROM spans WHERE e - s + 1 >= 16),
        |span_counts AS (
        |  SELECT doc_id, count(*) AS n_spans FROM long_spans GROUP BY doc_id),
        |cutpos AS (
        |  SELECT doc_id, unnest(generate_series(s, e)) AS p FROM long_spans),
        |rebuilt AS (
        |  SELECT tk.doc_id, count(*) AS n_tokens,
        |    count(c.p) AS n_cut_positions,
        |    md5(coalesce(
        |      string_agg(CASE WHEN c.p IS NULL THEN tk.tok END, ' ' ORDER BY tk.p),
        |      '')) AS clean_hash
        |  FROM toks tk LEFT JOIN cutpos c
        |    ON tk.doc_id = c.doc_id AND tk.p = c.p
        |  GROUP BY tk.doc_id)
        |SELECT r.doc_id, r.n_tokens, coalesce(sc.n_spans, 0) AS n_spans,
        |  r.n_cut_positions, r.clean_hash
        |FROM rebuilt r LEFT JOIN span_counts sc ON r.doc_id = sc.doc_id
        |ORDER BY r.doc_id""".stripMargin
  )
}
