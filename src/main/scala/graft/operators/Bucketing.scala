package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (100 TB joins without a shuffle).
  *
  * Writing both join sides bucketed (and sorted) on their join keys with
  * the same bucket count lets Spark's scan planner line buckets up
  * one-to-one: the sort-merge join needs NO Exchange and NO Sort — the
  * single most important layout optimization for repeated fact-fact joins
  * at scale. Asserted in BucketingSpec by checking the executed plan.
  */
object Bucketing {

  /** Write as a bucketed+sorted managed parquet table (Spark only supports
    * bucketing through saveAsTable).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous crashed run can leave the managed location behind, which
    // CREATE TABLE AS refuses; clear it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    graft.sources.Fs.rm(spark, s"$warehouse/$table", recursive = true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame =
    spark.table(leftTable).join(
      spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
