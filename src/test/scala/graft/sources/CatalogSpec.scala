package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

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
