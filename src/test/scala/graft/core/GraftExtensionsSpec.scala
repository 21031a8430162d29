package graft.core

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("extension class injects all five functions without error") {
    // A fresh SparkSession with spark.sql.extensions would exercise this at
    // session build; here we apply directly (the shared test session already
    // exists) and rely on VectorFunctionsSpec for SQL-level behavior via the
    // imperative registration path.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("same expressions reachable in SQL via imperative registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
