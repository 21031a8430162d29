package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained group-by aggregate (materialized-view
  * maintenance) over a [[LakeTable]]'s change data feed.
  *
  * [[initialize]] computes `SELECT keys, count(*), sum(expr)... GROUP BY
  * keys` once over the base table; every later [[refresh]] reads ONLY
  * the change feed since the last applied version, turns each change
  * row into a signed delta (+1 for insert/update_postimage, -1 for
  * delete/update_preimage), aggregates the deltas per key, and MERGEs
  * them into the view — updating touched groups, inserting new ones,
  * deleting groups whose count reaches zero.
  *
  * This is the classic self-maintainable-aggregate result (COUNT/SUM
  * are self-maintainable under insert+delete; an UPDATE is modeled as
  * delete+insert, which is exactly what the change feed records): at
  * 100 TB a nightly recompute scans the world, while refresh cost is
  * `O(changes) + O(view)` — independent of base-table size.
  *
  * Exactness: pass DECIMAL-typed sum expressions when the view must
  * equal a from-scratch recompute bit-for-bit (decimal addition is
  * exact and order-independent; float sums drift by summation order).
  *
  * Single-writer assumption, like the rest of the lake layer: refresh
  * and base-table commits must not interleave mid-call.
  */
final class MaterializedAgg(
    spark: SparkSession,
    base: LakeTable,
    val viewPath: String,
    keys: Seq[String],
    sums: Map[String, Column]) {

  private val CountCol = "n_rows"

  require(keys.nonEmpty, "at least one group key")
  require(!sums.contains(CountCol) && !keys.contains(CountCol),
    s"'$CountCol' is reserved for the maintained count")

  private val view = LakeTable(spark, viewPath)
  private val stateFile =
    new Path(new Path(viewPath, LakeTable.LogDirName), "_mv_watermark")

  private def fs =
    stateFile.getFileSystem(spark.sessionState.newHadoopConf())

  /** The view contents (keys, n_rows, one column per sum alias). */
  def read: DataFrame = view.read

  /** Full compute + watermark capture. The watermark is the base
    * table's CURRENT latest commit version: change sets at or below it
    * are already reflected in the full scan.
    */
  def initialize(): MaterializedAgg = {
    val current = latestBaseVersion()
    view.write(aggregate(base.read))
    saveWatermark(current)
    this
  }

  /** Apply every change-feed version in `(watermark, latest]` where
    * `latest` is the base table's latest COMMITTED version. Change sets
    * publish AFTER their commit record (the lake layer's
    * visible-implies-committed contract), so every visible set at or
    * below `latest` is final and exactly-once follows from the
    * watermark alone. No-op when nothing new was recorded. Returns this
    * for chaining.
    */
  def refresh(): MaterializedAgg = {
    val wm = watermark()
    // bounded by the PUBLISHED frontier, not the committed latest: a
    // committed-but-not-yet-published change set must not be skipped
    // past (its publication would then trigger a below-watermark no-op
    // and the delta would be lost forever)
    val latest = base.publishedFrontier(wm)
    if (latest <= wm) return this
    val changes =
      try base.readChanges(fromVersion = wm + 1, toVersion = latest)
      catch {
        // commits happened but none recorded a change set (e.g. stats
        // collection, constraint DDL) — nothing to apply
        case _: IllegalArgumentException =>
          saveWatermark(latest)
          return this
      }
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltaAggs =
      sum(sign).as(CountCol) +:
        sums.toSeq.sortBy(_._1).map { case (alias, e) =>
          // sum of signed contributions; a NULL measure contributes 0
          // both here and in aggregate()'s full compute
          sum(sign * coalesce(e, lit(0))).as(alias)
        }
    val deltas = changes.groupBy(keys.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)

    // absolute new values for the touched keys only: one left join of
    // the (small) delta set against the view, then a keyed MERGE — the
    // base table is never read
    val cur = view.read
    val merged = deltas.alias("d")
      .join(cur.alias("m"), keys.toIndexedSeq, "left_outer")
      .select((keys.map(col) ++
        Seq((coalesce(col("m." + CountCol), lit(0L)) + col("d." + CountCol)).as(CountCol)) ++
        sums.keys.toSeq.sorted.map { alias =>
          (coalesce(col("m." + alias), lit(0).cast(cur.schema(alias).dataType)) +
            col("d." + alias)).as(alias)
        }): _*)
    // the watermark rides INSIDE the merge commit (extraParams), so the
    // applied delta and the version it covers move atomically: a crash
    // between the merge and the state-file write can no longer leave an
    // applied-but-unmarked delta that a restarted stream re-adds
    // (sums are DELTAS, so unlike the join view's content-idempotent
    // merges, a double-apply here would be a real double count). The
    // state file remains as a cheap cache; watermark() takes the max.
    view.merge(
      merged, keys,
      whenMatched = Seq(
        MergeClause.DeleteWhen(Some(col("s." + CountCol) === 0L)),
        MergeClause.UpdateWhen(
          (CountCol +: sums.keys.toSeq).map(c => c -> col("s." + c)).toMap)),
      insertUnmatched = true,
      insertCond = Some(col(CountCol) > 0L),
      extraParams = Map(MaterializedAgg.WatermarkParam -> latest.toString))
    saveWatermark(latest)
    this
  }

  /** CONTINUOUS maintenance: a streaming query tailing the base table's
    * change feed that calls [[refresh]] once per discovered micro-batch —
    * the view tracks base-table commits without polling or manual
    * refresh calls. Refresh derives everything from the watermark and
    * the change-feed versions and is a no-op when already current, which
    * makes the stream RESTART-SAFE for free (an at-least-once replayed
    * trigger re-runs a refresh that sees nothing new). Because change
    * sets publish only AFTER their commit record lands, a notification
    * batch always finds the commits it names already in the log — the
    * bounded-wait/defer machinery this stream once needed (the old
    * change-files-before-commit window) is gone with the window itself,
    * and `processAllAvailable()` implies current. Requires at least one
    * recorded change set (the change-feed streaming-source
    * precondition).
    */
  def startStream(
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery =
    base.readChangesStream.writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        // inputs are immutable change sets, but the view merge's plan
        // still lists the view dir — retry survives a torn scan under
        // any concurrent swap (see LakeTable.retryTornRead)
        LakeTable.retryTornRead("agg-view refresh")(refresh()): Unit
      }
      .trigger(trigger)
      .start()

  /** The from-scratch aggregate — initialize uses it, and tests compare
    * refresh output against it directly.
    */
  def aggregate(data: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as(CountCol) +:
      sums.toSeq.sortBy(_._1).map { case (alias, e) =>
        // NULL measures contribute 0, mirroring the delta path — the
        // two formulations must agree for refresh == recompute to hold
        sum(coalesce(e, lit(0))).as(alias)
      }
    data.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def latestBaseVersion(): Long =
    CommitLog.nextVersion(fs, new Path(base.path, LakeTable.LogDirName)) - 1L

  private def watermark(): Long = {
    val f = fs
    val fromFile =
      if (!f.exists(stateFile)) -1L
      else {
        val in = f.open(stateFile)
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
    // the commit-carried watermark is authoritative (it moves with the
    // delta); the state file only ever lags it, never leads
    math.max(fromFile, view.maxCommitParamLong(MaterializedAgg.WatermarkParam))
  }

  /** Lives in the view's log dir (no `.json` suffix, so the commit glob
    * ignores it) and therefore survives the view's own rewrites and
    * overwrites exactly like the schema file does.
    */
  private def saveWatermark(v: Long): Unit = {
    val f = fs
    if (!f.exists(stateFile.getParent)) f.mkdirs(stateFile.getParent)
    LakeIo.atomicOverwrite(f, stateFile, v.toString)
  }
}

object MaterializedAgg {

  /** Commit param on the view's merge commits carrying the base version
    * the applied delta covers — the crash-atomic half of the watermark
    * (see [[MaterializedAgg.refresh]]).
    */
  val WatermarkParam = "mvAggWatermark"

  def apply(
      spark: SparkSession,
      base: LakeTable,
      viewPath: String,
      keys: Seq[String],
      sums: Map[String, Column]): MaterializedAgg =
    new MaterializedAgg(spark, base, viewPath, keys, sums)
}
