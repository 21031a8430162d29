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
}
