package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText: NFC composes combining sequences, controls stripped, codegen parity") {
    import graft.functions.TextExpressions
    // e + U+0301 composes to the single precomposed char; bell stripped;
    // tab/newline survive; C1 NEL (U+0085) stripped
    val df = Seq("e\u0301cole\u0007 a\tb\nc\u0085d").toDF("t")
    val got = df.select(TextExpressions.normalizeText(col("t"))).head.getString(0)
    assert(got === "\u00e9cole a\tb\ncd")
    assert(got.length === "Xcole a\tb\ncd".length)
    // already-NFC text passes through untouched
    val clean = "plain ascii text 123"
    assert(Seq(clean).toDF("t")
      .select(TextExpressions.normalizeText(col("t"))).head.getString(0) === clean)
    // interpreted and codegen paths agree
    val q = df.select(TextExpressions.normalizeText(col("t")).as("c"))
    val codegen = q.head.getString(0)
    val savedWhole = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def restore(key: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(q.head.getString(0) === codegen)
    finally {
      restore("spark.sql.codegen.wholeStage", savedWhole)
      restore("spark.sql.codegen.factoryMode", savedMode)
    }
  }

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
