package graft.core

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("frequent_items is callable from pure SQL (aggregate via extension injection)") {
    import spark.implicits._
    if (!spark.catalog.functionExists("frequent_items")) {
      // foreign session fallback — GraftSession sessions get it injected
      org.apache.spark.sql.GraftBridge.registerFunction(spark, "frequent_items",
        es => graft.functions.FrequentItems(
          es.head, es(1).eval().asInstanceOf[Int]).toAggregateExpression())
    }
    (Seq.fill(50)("hot") ++ (0 until 10).map(i => s"rare$i"))
      .toDF("item").createOrReplaceTempView("fi_items")
    val top = spark.sql(
      "SELECT frequent_items(item, 4) AS hh FROM fi_items")
      .selectExpr("hh[0].item", "hh[0].est").head
    assert(top.getString(0) === "hot")
    assert(top.getLong(1) >= 50 - 60 / 5) // MG lower bound: N/(k+1)
  }

  test("literal-int arguments are guarded: clear analysis error, not a ClassCastException") {
    import spark.implicits._
    import org.apache.spark.sql.AnalysisException
    // the shared session is built with spark.sql.extensions=GraftExtensions,
    // so these resolve through the guarded injection builders
    assume(spark.catalog.functionExists("frequent_items"))
    Seq("alpha beta", "gamma delta").toDF("item").createOrReplaceTempView("fi_guard")
    // non-foldable k (a column expression)
    val e1 = intercept[AnalysisException](
      spark.sql("SELECT frequent_items(item, length(item)) FROM fi_guard").collect())
    assert(e1.getMessage.contains("frequent_items") && e1.getMessage.contains("foldable"), e1.getMessage)
    // foldable but not an integer type
    val e2 = intercept[AnalysisException](
      spark.sql("SELECT frequent_items(item, '4') FROM fi_guard").collect())
    assert(e2.getMessage.contains("INT"), e2.getMessage)
    // same guard on the other literal-int injections
    val e3 = intercept[AnalysisException](
      spark.sql("SELECT shingles(split(item, ' '), item) FROM fi_guard").collect())
    assert(e3.getMessage.contains("shingles"), e3.getMessage)
    val e4 = intercept[AnalysisException](
      spark.sql("SELECT minhash_signature(split(item, ' '), 8, item) FROM fi_guard").collect())
    assert(e4.getMessage.contains("minhash_signature"), e4.getMessage)
    // a long literal within Int range still works
    val ok = spark.sql("SELECT frequent_items(item, 4L) AS hh FROM fi_guard").head
    assert(ok.getSeq[Any](0).nonEmpty)
  }

  test("extension class injects all functions without error") {
    // A fresh SparkSession with spark.sql.extensions would exercise this at
    // session build; here we apply directly (the shared test session already
    // exists) and rely on VectorFunctionsSpec for SQL-level behavior via the
    // imperative registration path.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("levenshtein thresholds grow a length-band guard, exactly once") {
    val df = graft.analytics.Descriptive.fuzzyPartNames(spark, sf0001)
    val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("levenshtein"), opt)
    // idempotent under the fixed-point optimizer batch: ONE guard, not one
    // per iteration
    assert("abs\\(".r.findAllIn(opt).size == 1, opt)
    assert(opt.contains("length"), opt)
  }

  test("band guard preserves levenshtein-filter results") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, levenshtein}
    val pairs = Seq(("kitten", "sitting"), ("abc", "abd"), ("a", "abcdef"))
      .toDF("a", "b")
    val got = pairs.where(levenshtein(col("a"), col("b")) <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // kitten->sitting = 3 edits (in); a->abcdef = 5 inserts, and the length
    // band alone (|1-6| > 3) must exclude it, not change its answer
    assert(got == Set(("kitten", "sitting"), ("abc", "abd")))
  }

  test("same expressions reachable in SQL via imperative registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("graft_lake TVF reads a lake table from pure SQL, with time travel") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val plain = s"$base/plain"
    graft.sources.LakeTable(spark, plain)
      .write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val got = spark.sql(s"SELECT id, v FROM graft_lake('$plain') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b")))
    // filters still reach the scan through the TVF (analyzed-plan splice)
    val filtered = spark.sql(
      s"SELECT count(*) AS n FROM graft_lake('$plain') WHERE id = 2").head.getLong(0)
    assert(filtered === 1L)

    val versioned = s"$base/versioned"
    val vt = graft.sources.VersionedLakeTable(spark, versioned)
    vt.write(Seq((1L, "v0")).toDF("id", "v"))
    vt.write(Seq((1L, "v1"), (2L, "v1")).toDF("id", "v"))
    val v0 = spark.sql(s"SELECT v FROM graft_lake('$versioned', 0)")
      .collect().map(_.getString(0)).toSeq
    assert(v0 === Seq("v0"))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_lake('$versioned', 1)")
      .head.getLong(0) === 2L)
    // non-literal path is an analysis error, not a ClassCastException
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graft_lake(rand()::STRING)").collect())
    assert(e.getMessage.contains("graft_lake"), e.getMessage)
  }

  test("graft_history and graft_changes TVFs expose log and CDC rows in SQL") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tvf2").toString
    val path = s"$base/t"
    val lake = graft.sources.LakeTable(spark, path)
    lake.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    lake.upsert(Seq((2L, 25.0), (3L, 30.0)).toDF("id", "x"), Seq("id"),
      changeFeed = true)
    val ops = spark.sql(
      s"SELECT operation FROM graft_history('$path') ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops.head.startsWith("WRITE"), ops)
    assert(ops.exists(_.contains("MERGE")), ops)
    val byType = spark.sql(
      s"""SELECT _change_type, count(*) AS n FROM graft_changes('$path')
         |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.get("insert").contains(1L), byType)
    assert(byType.get("update_postimage").contains(1L), byType)
  }

  test("graft_bm25_topk serves a standing inverted index from pure SQL") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, sf0001).documents
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlbm25")
      .resolve("idx").toString
    graft.text.InvertedIndex.build(docs, "doc_id", "text", dir)
    // a real query: the alphabetically-first 2 tokens of doc 0
    val terms = docs.where(col("doc_id") === 0)
      .select(explode(array_sort(array_distinct(
        graft.text.TextFunctions.tokens(col("text"))))).as("t"))
      .limit(2).collect().map(_.getString(0)).toSeq
    val viaSql = spark.sql(
      s"SELECT * FROM graft_bm25_topk('$dir', '${terms.mkString(" ")}', 5)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    import spark.implicits._
    val viaApi = graft.text.InvertedIndex
      .serveBm25(spark, dir, terms.map((0L, _)).toDF("query_id", "term"), 5)
      .select("rank", "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql.nonEmpty && viaSql === viaApi)
  }

  test("graft_ann_topk serves a standing IVF index from pure SQL, self included") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.core.Tables(spark, sf0001).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlann")
      .resolve("idx").toString
    graft.text.IvfIndex.build(e, "vec_id", "embedding", dir, nCells = 8, seed = 42L)
    val vec = e.where(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    // Float.toString round-trips through parseFloat, so the SQL literal
    // rebuilds the exact stored bits
    val lit = vec.map(f => s"CAST('$f' AS FLOAT)").mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_ann_topk('$dir', $lit, 3, 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaApi = graft.text.IvfIndex
      .serveTopK(spark, dir, Seq((-1L, vec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, nProbe = 3)
      .select("rank", "vec_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql === viaApi)
    // the query vector IS vector 0, and the sentinel query id means the
    // stored copy is a legal (perfect-cosine) result
    assert(viaSql.head._2 === 0L && viaSql.head._3 === 1.0)
    // argument guards: non-foldable vector is an analysis error
    e.limit(1).createOrReplaceTempView("ann_guard")
    val err = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM graft_ann_topk('$dir', " +
        "(SELECT embedding FROM ann_guard), 3)").collect())
    assert(err.getMessage.contains("graft_ann_topk"), err.getMessage)
  }
}
