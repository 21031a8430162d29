package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the driver testdata star schema + stream/LLM tables
  * (`TESTDATA.md`): region, nation, customer, supplier, part, orders,
  * lineitem, events, documents, embeddings — one parquet per table under a
  * scale-factor directory.
  *
  * Every reader is a plain `spark.read.parquet` so Catalyst owns pushdown,
  * pruning, and partition planning; no eager caching (callers decide).
  */
final class Tables(spark: SparkSession, sfDir: String) {
  GraftSession.ensureConfigured(spark)

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** Raw events: `ts` is epoch-nano bigint (see [[GraftSession]]). */
  def eventsRaw: DataFrame = load("events")

  /** Events with `ts_ts` timestamp column derived from the nano epoch.
    * Nanos -> micros via integer division, then `timestamp_micros`.
    */
  def events: DataFrame =
    eventsRaw.withColumn("ts_ts", Tables.nanosToTimestamp(col("ts")))
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)

  /** epoch-nanos bigint -> TimestampType (micro precision, truncating).
    * Integral division via decimal: `c / 1000L` would promote to DOUBLE,
    * whose 53-bit mantissa cannot hold epoch-nanos (~1.7e18) — that rounds
    * the microsecond and corrupts timestamps by ±1us.
    */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros(floor(c.cast("decimal(38,0)") / lit(1000)).cast("long"))
}
