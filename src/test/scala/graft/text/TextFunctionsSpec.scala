package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and shingles") {
    val df = Seq("The quick  brown fox").toDF("t")
    assert(df.select(TextFunctions.tokenCount(col("t"))).head.getInt(0) === 4)
    val sh = df.select(TextFunctions.shingles(col("t"), 2)).head.getSeq[String](0)
    assert(sh === Seq("the quick", "quick brown", "brown fox"))
  }

  test("shingles on short text is empty, not an error") {
    val sh = Seq("one two").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).head.getSeq[String](0)
    assert(sh.isEmpty)
  }

  test("langId identifies real prose in 5 languages") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der hund ist nicht in der stadt und das ist gut", "de"),
      ("el perro es grande y la casa es blanca como la nieve", "es"),
      ("le chat est dans la maison et il est content pour ce jour", "fr"),
      ("我 是 一 个 人 他 的 书 在 那 里", "zh")
    )
    val got = samples.map(_._1).toDF("t")
      .select(TextFunctions.langId(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq === samples.map(_._2))
  }

  test("langId falls back to 'und' on no stopword signal") {
    val g = Seq("zzz qqq xxx").toDF("t")
      .select(TextFunctions.langId(col("t"))).head.getString(0)
    assert(g === "und")
  }

  test("qualityScore in [0,1]; long diverse text scores higher than repeated-token text") {
    val df = Seq(
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon", "good"),
      ("spam spam spam spam", "bad")
    ).toDF("t", "kind")
    val scores = df.select(col("kind"), TextFunctions.qualityScore(col("t")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(scores("good") > scores("bad"))
  }

  test("fingerprint64 is whitespace-robust and order-sensitive") {
    val fps = Seq("a b c", "a  b   c", "c b a").toDF("t")
      .select(TextFunctions.fingerprint64(col("t"))).collect().map(_.getLong(0))
    assert(fps(0) === fps(1)) // extra whitespace ignored
    assert(fps(0) !== fps(2)) // order matters
  }
}
