package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("a backslash-then-quote in the location cannot break the spliced DDL") {
    // Spark's lexer treats \ as an escape inside string literals: if only
    // quotes were doubled, `x\'y` would become `x\''y` where \' swallows
    // the first doubled quote and the literal ends early
    val base = Files.createTempDirectory("graft_catalog_bs").toString
    val path = base + """/x\'y.parquet"""
    Seq((1, "a")).toDF("id", "s").write.parquet(path)
    Catalog.createDatabase(spark, "graft_bs_db")
    try {
      Catalog.registerTable(spark, "graft_bs_db", "bs", path)
      assert(spark.table("graft_bs_db.bs").count() === 1)
    } finally {
      Catalog.dropDatabase(spark, "graft_bs_db")
    }
  }

  test("a quote in the table location cannot break the spliced DDL") {
    val base = Files.createTempDirectory("graft_catalog").toString
    val path = s"$base/it's data.parquet"
    Seq((1, "x"), (2, "y")).toDF("id", "s").write.parquet(path)
    Catalog.createDatabase(spark, "graft_quote_db")
    try {
      Catalog.registerTable(spark, "graft_quote_db", "quoted", path)
      assert(spark.table("graft_quote_db.quoted").count() === 2)
    } finally {
      Catalog.dropDatabase(spark, "graft_quote_db")
    }
  }
}
