package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV landing-zone ingest (SURVEY §2 A1).
  *
  * Reference shape: `spark.read.option('header','true')
  * .option('inferSchema','true').csv(path)` per EHR file
  * (00-etl-rwd.py:43-45). Schema inference is the landing-zone convenience;
  * once a table is in the lake its schema is fixed (schema-on-write), so
  * [[ingestAs]] takes an explicit StructType for the production path —
  * at 100 TB inference means an extra full pass over the data.
  */
object CsvIngest {

  def ingest(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Production path: explicit schema, single pass. */
  def ingestAs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** Landing CSVs -> de-identified lake table, the 00-etl-rwd.py pipeline
    * shape: read, hash PII, write parquet + commit.
    */
  def ingestToLake(
      spark: SparkSession,
      csvPath: String,
      lakePath: String,
      piiCols: Seq[String]
  ): LakeTable = {
    val df = graft.functions.Deidentify(ingest(spark, csvPath), piiCols)
    LakeTable(spark, lakePath).write(df)
  }
}
