package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key (the standard event-attribution
  * / point-in-time-feature operator Spark has no built-in for).
  *
  * Implementation choice (SURVEY §7.4 preference (a) — compose before
  * custom Catalyst): the union-and-carry-forward formulation needs exactly
  * ONE shuffle (by key) and ONE sort (by key, time) — the same physical
  * cost as the dedicated as-of sort-merge exec a custom SparkStrategy
  * would build, with AQE/spill/codegen for free:
  *
  *   1. tag left(1)/right(0) rows, union them;
  *   2. per key, order by (time, tag) — tag puts the right row FIRST on
  *      ties, making the match inclusive (rightTime == leftTime matches);
  *   3. `last(rightValue, ignoreNulls)` over rows-unbounded-preceding
  *      carries the latest right values forward;
  *   4. keep left rows.
  *
  * At 100 TB both sides stream through one Exchange each; no broadcast,
  * no per-key state beyond the sort.
  */
object AsOfJoin {

  /** @param leftTime/rightTime  comparable time columns (same type)
    * @param carryCols           right columns carried onto left rows
    * @param forward             false (default): latest right row with
    *                            rightTime <= leftTime; true: EARLIEST right
    *                            row with rightTime >= leftTime — same plan,
    *                            the union is just sorted in reverse time
    * @param tolerance           max allowed |leftTime - rightTime| (same
    *                            numeric units as the time columns); a match
    *                            farther away surfaces as NULL carry, like
    *                            pandas merge_asof(tolerance=...)
    * @note if the right side has several rows with the SAME (key, time),
    *       which of them is carried is not deterministic (rows tie in the
    *       sort) — pre-aggregate the right side to one row per (key, time)
    *       as qAsofAttribution does when determinism matters
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      carryCols: Seq[String],
      forward: Boolean = false,
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(carryCols.contains),
      s"carryCols ${carryCols.intersect(leftCols)} collide with left columns")

    // NULL join keys never match (equi/ASOF join semantics) — but
    // Window.partitionBy groups NULL keys into ONE partition, which would
    // carry values between unrelated null-key rows. Route null-key left
    // rows around the window (they surface with null carry) and drop
    // null-key right rows (they could never be matched).
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val keyHasNull = keys.map(col(_).isNull).reduce(_ || _)
    val matchableLeft = left.where(keyNotNull)
    val matchableRight = right.where(keyNotNull)
    val nullKeyLeft = left.where(keyHasNull)

    // the carried values travel as ONE struct: last(ignoreNulls) then picks
    // the latest right ROW atomically. Carrying columns individually would
    // (a) skip a legitimately-NULL field on the latest row in favor of a
    // stale older value and (b) mix fields from different right rows.
    // The right TIME rides in the struct too, for the tolerance check.
    val carryStruct = struct(
      (col(rightTime).as("__rt") +: carryCols.map(col)): _*)
    val taggedRight = matchableRight.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"),
          carryStruct.as("__carry")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = matchableLeft.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
          lit(null).cast(taggedRight.schema("__carry").dataType).as("__carry")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // backward: ascending time, latest right at-or-before carries forward.
    // forward: the SAME carry logic over time reversed — the "last right
    // seen" is then the earliest right at-or-after. Ties (__tag) keep the
    // right row first in both directions, making the match inclusive.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // tolerance: a carried right row farther than `tol` from the left time
    // reverts to no-match (NULL carry) — checked on the struct's __rt
    // field, after the window, so it cannot un-hide a nearer older row
    // (there is none: the window already picked the nearest in direction)
    val carried = last(col("__carry"), ignoreNulls = true).over(w)
    val gated = tolerance match {
      case Some(tol) =>
        val dist =
          if (forward) col("__carry.__rt") - col("__t")
          else col("__t") - col("__carry.__rt")
        when(dist <= tol, col("__carry"))
      case None => col("__carry")
    }
    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("__carry", carried)
      .where(col("__tag") === 1)
      .withColumn("__carry", gated)
      .select(
        leftCols.map(col) ++
          carryCols.map(c => col(s"__carry.$c").as(c)): _*)
    val unmatched = nullKeyLeft.select(
      leftCols.map(col) ++
        carryCols.map { c =>
          val f = taggedRight.schema("__carry").dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType](c)
          lit(null).cast(f.dataType).as(f.name)
        }: _*)
    matched.unionByName(unmatched)
  }

  // ---------- declared query ----------

  type Q = (SparkSession, String) => DataFrame

  /** Purchase-to-last-view attribution over the events stream: for each
    * purchase, the most recent prior (or simultaneous) view by the same
    * user. Right side deduped to one row per (user, ts) so ties are
    * deterministic across engines.
    */
  def qAsofAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).eventsRaw
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_event_id"))
    asOf(
      purchases, views,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      carryCols = Seq("view_event_id"))
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"))
      .orderBy(col("event_id"))
  }

  /** Forward variant: for each purchase, the EARLIEST view at-or-after it
    * (the "next-touch" attribution dual).
    */
  def qAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).eventsRaw
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_event_id"))
    asOf(
      purchases, views,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      carryCols = Seq("view_event_id"), forward = true)
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"))
      .orderBy(col("event_id"))
  }

  /** Tolerance variant: prior view only counts within 10 minutes of the
    * purchase (`ts` is epoch nanos in the testdata).
    */
  def qAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).eventsRaw
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_event_id"))
    asOf(
      purchases, views,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      carryCols = Seq("view_event_id"),
      tolerance = Some(lit(600L * 1000 * 1000 * 1000)))
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"))
      .orderBy(col("event_id"))
  }

  def queries: Map[String, Q] = Map(
    "q_asof_attribution" -> (qAsofAttribution _),
    "q_asof_forward" -> (qAsofForward _),
    "q_asof_tolerance" -> (qAsofTolerance _)
  )

  def oracles: Map[String, String] = Map(
    "q_asof_attribution" ->
      """SELECT p.event_id, p.user_id, ifnull(v.view_event_id, -1) AS view_event_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS view_event_id
        |                FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_forward" ->
      """SELECT p.event_id, p.user_id, ifnull(v.view_event_id, -1) AS view_event_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS view_event_id
        |                FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
        |  ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
        | ifnull(CASE WHEN p.ts - v.ts <= INTERVAL 10 MINUTE THEN v.view_event_id END,
        |        -1) AS view_event_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS view_event_id
        |                FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin
  )
}
