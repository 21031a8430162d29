package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("span dedup excises exactly the copied 8-gram span, first occurrence survives") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val docs = Seq(
      (1L, s"one two three $span four five six"),
      (2L, s"seven eight nine ten $span eleven twelve"), // copies doc 1's span
      (3L, "totally fresh words with no overlap at all here")
    ).toDF("doc_id", "text")

    val covered = CorpusOps.coveredPositions(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    // only doc 2's copy is covered: its span occupies 1-based positions 5..12
    assert(covered.forall(_._1 == 2L),
      s"only the later copy should be excised: $covered")
    assert(covered.map(_._2) === (5 to 12).toSet, s"wrong span positions: $covered")
  }

  test("adjacent covered positions merge into MAXIMAL spans; only long spans are cut") {
    val long = (1 to 20).map(i => s"w$i").mkString(" ") // 20-token span
    val short = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val docs = Seq(
      (1L, s"one two $long three four"),
      (2L, s"five six seven $long eight"), // copy → covered positions 4..23
      (3L, s"nine ten $short eleven"),
      (4L, s"twelve $short thirteen fourteen") // copy, but only 8 < 16 tokens
    ).toDF("doc_id", "text")

    val spans = CorpusOps.duplicatedSpans(docs, "doc_id", "text", n = 8, minLength = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // exactly ONE span survives the length threshold: doc 2's 20-token
    // copy, merged into a single maximal [4, 23] run — not ten 8-gram
    // fragments; doc 4's short copy is below minLength and kept
    assert(spans.toSeq === Seq((2L, 4, 23, 20)), s"wrong spans: ${spans.toSeq}")

    // and with the threshold at 8, doc 4's copy appears too (positions 2..9)
    val all = CorpusOps.duplicatedSpans(docs, "doc_id", "text", n = 8, minLength = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(all === Set((2L, 4, 23, 20), (4L, 2, 9, 8)), s"wrong spans: $all")
  }

  test("hot-gram routing yields identical covered positions for any cap") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    // doc 0 holds the first occurrence; 30 later docs each copy the span
    // (a "boilerplate" gram with df=31), plus a pair sharing a rarer span
    val docs = ((0L to 30L).map(i => (i, s"intro$i words$i here$i $span tail$i")) ++
      Seq((40L, "rare one two three four five six seven eight nine"),
        (41L, "other rare one two three four five six seven eight")))
      .toDF("doc_id", "text")
    def positions(cap: Option[Int]) =
      CorpusOps.coveredPositions(docs, "doc_id", "text", n = 8, hotGramDf = cap)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = positions(None)
    // caps that make the span gram hot (df 31 > 5), everything hot (> 0
    // routes every duplicated gram), and nothing hot (> 1000) must all
    // produce the SAME covered set — routing changes the plan, not the answer
    assert(positions(Some(5)) === plain)
    assert(positions(Some(0)) === plain)
    assert(positions(Some(1000)) === plain)
    assert(plain.nonEmpty && plain.forall(_._1 > 0L),
      s"doc 0's first occurrence must survive: $plain")
  }

  test("unigram logprob ranks common-token docs as lower perplexity") {
    // common tokens repeated => high probability => low ppl; rare soup => high ppl
    val docs = Seq(
      (1L, "the the the the the the the the"),
      (2L, "qqq www eee rrr ttt yyy uuu iii")
    ).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = tok.groupBy("tok").agg(count(lit(1)).cast("double").as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val ppl = tok.join(counts, Seq("tok")).crossJoin(total)
      .groupBy("doc_id")
      .agg(exp(-avg(log(col("n") / col("total")))).as("ppl"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl(1L) < ppl(2L),
      s"repeated common tokens must score lower perplexity: $ppl")
  }

  test("line dedup drops EVERY occurrence of a corpus-frequent line, first included") {
    val boiler = "cookie banner accept all" // exactly one 4-token line
    val docs = Seq(
      (1L, s"a b c d $boiler"),
      (2L, s"e f g h $boiler"), // boiler df=2 -> excised from BOTH
      (3L, "i j k l m") // 5 tokens -> 2 lines, nothing shared
    ).toDF("doc_id", "text")
    val out = CorpusOps.dedupLines(docs, "doc_id", "text", lineWidth = 4, maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 === 2L && out(1L)._2 === 1L)
    assert(out(2L)._1 === 2L && out(2L)._2 === 1L)
    assert(out(3L) === (2L, 2L, md5Of("i j k l m")))
    // the C4 semantics: the FIRST occurrence is dropped too
    assert(out(1L)._3 === md5Of("a b c d"), "doc 1 must lose its boiler line")
    assert(out(2L)._3 === md5Of("e f g h"), "doc 2 must lose its boiler line")
  }

  private def md5Of(s: String): String =
    spark.sql(s"SELECT md5('$s')").head.getString(0)

  test("repetition signals: duplicated lines and top-word mass are exact") {
    val docs = Seq(
      (1L, "x x x x"), // lines(2): [x x, x x] -> all duplicated
      (2L, "a b c d") // no repetition anywhere
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionSignalsFor(docs, lineWidth = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) === (4L, 1.0, 0.5, 1.0)) // top word x=4/4; 1 distinct of 2 lines; all chars
    assert(out(2L) === (4L, 0.25, 0.0, 0.0))
  }

  test("word entropy: uniform pair is ln(2), single word is exactly +0.0") {
    val docs = Seq((1L, "a a b b"), (2L, "z z z")).toDF("doc_id", "text")
    val out = CorpusOps.wordEntropyFor(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 === 2L)
    assert(out(1L)._2 === math.rint(math.log(2) * 1e6) / 1e6) // 0.693147
    assert(out(1L)._3 === 1.0) // entropy at its max -> normalized 1
    // single-word doc: the fold sums to zero and must surface as +0.0
    // (an IEEE -0.0 here would hash-mismatch the DuckDB oracle)
    assert(out(2L) === (1L, 0.0, 0.0))
    assert(java.lang.Double.doubleToRawLongBits(out(2L)._2) === 0L,
      "entropy must be +0.0, not -0.0")
  }

  test("chunking covers every token with the declared overlap") {
    import spark.implicits._
    // 95 tokens, size 50 / overlap 10 -> stride 40: chunks at 0, 40, 80
    val text = (0 until 95).map(i => s"w$i").mkString(" ")
    val out = CorpusOps.chunkDocuments(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 50, 10)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (0L, 50L, "w0", "w49"),
      (1L, 50L, "w40", "w89"),
      (2L, 15L, "w80", "w94")))
    // a short doc yields exactly one whole-doc chunk
    val one = CorpusOps.chunkDocuments(
      Seq((2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 50, 10)
      .collect()
    assert(one.length === 1 && one.head.getLong(2) === 3L)
  }
}
