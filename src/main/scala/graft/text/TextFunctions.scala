package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks (SURVEY §2 M4; north-star "text analysis"
  * pillar: language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything is composed from codegen'd built-ins (split/transform/
  * array_intersect/xxhash64...) — no UDFs — so these run inside whole-stage
  * codegen on the 100 TB path.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword-level token count: word pieces + punctuation runs
    * (regexp over \p{L}+|\p{N}+|punct), the usual pre-tokenizer shape.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"""), lit(0)))

  /** Punctuation character ratio (0 for clean prose). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    round(punct.cast("double") / greatest(length(text), lit(1)), 6)
  }

  /** n-token distinct shingles of a token-array column, via the custom
    * [[graft.functions.ShinglesExpr]] expression: evaluates the token
    * array ONCE per row. The equivalent transform/slice/array_join lambda
    * pipeline re-evaluates the upstream tokenization per element (and
    * CollapseProject defeats projection-boundary workarounds) — measured
    * 25s -> <1s on 5,000 docs. Empty array for texts shorter than n.
    */
  def shinglesOf(ts: Column, n: Int): Column =
    graft.functions.TextExpressions.shingles(ts, n)

  /** Convenience single-expression form over raw text. */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** PII redaction for training corpora: emails, dotted-quad IPs, then
    * phone-shaped digit runs replaced by typed placeholders (in that
    * order — emails contain digits and IPs would otherwise be eaten by
    * the phone pattern). Pure chained `regexp_replace` (codegen'd,
    * replaces ALL occurrences), with patterns restricted to syntax Java
    * regex and RE2 interpret identically so the DuckDB oracle can apply
    * the literal same expressions.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]")
    regexp_replace(ip, "\\+?[0-9][0-9 ()-]{6,}[0-9]", "[PHONE]")
  }

  // Tiny per-language stopword profiles. Enough to separate real prose in
  // the five testdata languages; scored by distinct-stopword overlap.
  // private[text] so TextQueries can derive the DuckDB oracle SQL from the
  // SAME lists — a hand-copied list would silently drift.
  private[text] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de", "un", "una", "por", "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "des", "du", "pour", "dans", "ce"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人", "都", "一")
  )

  /** Heuristic language-ID over stopword-profile overlap; `und` when no
    * profile matches. Pure expression: per-language distinct-overlap count,
    * argmax via chained when().
    */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(ts, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * healthy type-token ratio. The weights are heuristics; the point is the
    * distributed, codegen'd shape.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(20.0), lit(1.0)) // >=20 tokens -> full marks
    val punctScore = lit(1.0) - least(punctRatio(text) * 5, lit(1.0))
    val ttr = size(array_distinct(tokens(text))).cast("double") / greatest(nTok, lit(1.0))
    round(lit(0.4) * lenScore + lit(0.2) * punctScore + lit(0.4) * least(ttr * 2, lit(1.0)), 6)
  }

  /** Remove stopwords for a language from a tokens column. Uses filter +
    * array_contains rather than array_except: array_except deduplicates
    * the survivors, which would corrupt downstream term frequencies.
    */
  def removeStopwords(ts: Column, lang: String): Column =
    stopwords.get(lang) match {
      case Some(words) =>
        val w = array(words.map(lit): _*)
        filter(ts, t => !array_contains(w, t))
      case None => ts
    }

  /** 64-bit document fingerprint: order-sensitive rolling combination of
    * token hashes (xxhash64 seeded per position via the running value) —
    * equal fingerprints <=> equal token streams (w.h.p.), robust to
    * whitespace differences unlike hashing the raw string.
    */
  def fingerprint64(text: Column): Column =
    aggregate(
      tokens(text),
      lit(-3750763034362895579L), // FNV-1a 64 offset basis as the seed
      (acc, t) => xxhash64(acc, t)
    )
}
