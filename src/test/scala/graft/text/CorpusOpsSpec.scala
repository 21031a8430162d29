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
    docs.createOrReplaceTempView("spanfix_docs")

    // re-derive via the same operators CorpusOps.spanDedup composes, but
    // against the fixture instead of the documents table
    val withToks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val grams = withToks.where(size(col("ts")) >= 8)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ts")) - 7),
        i => struct(i.as("pos"),
          array_join(slice(col("ts"), i, lit(8)), " ").as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos"), col("g.gram"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("gram")).orderBy(col("doc_id"), col("pos"))
    val covered = grams.withColumn("rk", row_number().over(w))
      .where(col("rk") > 1)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 7)).as("p"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    // only doc 2's copy is covered: its span occupies 1-based positions 5..12
    assert(covered.forall(_._1 == 2L),
      s"only the later copy should be excised: $covered")
    assert(covered.map(_._2) === (5 to 12).toSet, s"wrong span positions: $covered")
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
}
