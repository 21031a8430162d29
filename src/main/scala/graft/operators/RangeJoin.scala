package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Binned range join — the equi-join-free interval join Spark's planner
  * would otherwise execute as an O(n²) BroadcastNestedLoopJoin (Spark has
  * no IEJoin/range-join optimization; this is the standard binning
  * rewrite).
  *
  * Pairs with |t_a − t_b| <= gap can differ by at most one gap-sized bin,
  * so: bin both sides by floor(t / gap), explode ONE side to
  * {bin−1, bin, bin+1}, hash-join on the bin, then filter the exact
  * predicate. Cost: 3x one side + a hash join on a well-distributed key —
  * shuffle-safe at 100 TB; the exact filter runs only on same-neighborhood
  * candidates.
  */
object RangeJoin {

  /** All id-ordered pairs of rows whose `tsCol` values lie within
    * `maxGapUs` microseconds; returns (a_id, b_id, gap_us).
    */
  def intervalSelfJoin(
      df: DataFrame,
      idCol: String,
      tsUsCol: String,
      maxGapUs: Long
  ): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(tsUsCol).as("us"))
      .withColumn("bin", expr(s"us div ${maxGapUs}L"))
    val expanded = base.select(
      col("id"), col("us"),
      explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"))
    // no dedup needed: side a's three exploded bins are distinct, so each
    // (a_id, b_id) pair can match b's single bin at most once
    expanded.as("a")
      .join(base.as("b"), col("a.bin") === col("b.bin") && col("a.id") < col("b.id"))
      .where(abs(col("a.us") - col("b.us")) <= maxGapUs)
      .select(
        col("a.id").as("a_id"),
        col("b.id").as("b_id"),
        abs(col("a.us") - col("b.us")).as("gap_us"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  /** Near-coincident event pairs: all events within 60 seconds of each
    * other (burst detection). DuckDB oracle is the plain inequality join —
    * its IEJoin handles it; Spark needs the binned rewrite.
    */
  def qEventBursts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).eventsRaw
      .select(col("event_id"),
        floor(col("ts").cast("decimal(38,0)") / lit(1000)).cast("long").as("ts_us"))
    intervalSelfJoin(ev, "event_id", "ts_us", maxGapUs = 60000000L)
  }

  def queries: Map[String, Q] = Map(
    "q_range_join_bursts" -> (qEventBursts _)
  )

  def oracles: Map[String, String] = Map(
    "q_range_join_bursts" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        | abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
        |ORDER BY a_id, b_id""".stripMargin
  )
}
