package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Centralizes the config every entry point (Verify, Bench, tests) needs:
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` table stores
  *     `ts` as Parquet INT64 TIMESTAMP(NANOS); without this flag Spark 4.x
  *     throws PARQUET_TYPE_ILLEGAL. With it, `ts` reads as epoch-nano bigint
  *     (convert with [[Tables.eventTime]]).
  *   - UTC session timezone, so timestamp rendering matches the DuckDB oracle.
  *   - Shuffle partitions sized for the local core count rather than the 200
  *     default; on a real cluster this would be set to ~2-3x total cores or
  *     left to AQE coalescing.
  *   - AQE on (default in 4.x, pinned here for clarity): runtime join-strategy
  *     switching, partition coalescing, and skew-join splitting are the
  *     mechanisms we rely on for 100 TB-scale robustness.
  *
  * Capability derived from the reference's notebook-global `spark` handle
  * (reference: 00-etl-rwd.py:42, 02-patient-trajectory.py:49) re-expressed as
  * an explicit factory.
  */
object GraftSession {

  /** Apply graft-required dynamic confs to an existing builder. The graft
    * custom expressions (cosine_sim, shingles, ...) reach pure-SQL users
    * through the standard SparkSessionExtensions injection — a static conf,
    * so it must be on the builder, not set post-hoc.
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.core.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  /** Local session with `n` cores; shuffle partitions matched to cores. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Defensive re-apply of the dynamic confs on a session we did not build
    * (e.g. a driver-created one). All of these are dynamic SQLConfs, so
    * setting them post-hoc is safe and takes effect for subsequent reads.
    */
  def ensureConfigured(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
