package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned lake table with time travel — the full Delta-style contract
  * the plain [[LakeTable]] trades away (SURVEY §7.5.4 declared time travel
  * out of scope v1; this closes that gap).
  *
  * Layout: every write lands in an immutable `_v{N}/` snapshot directory
  * under the table path (underscore prefix -> invisible to naive
  * `spark.read.parquet(path)` listings), beside the same `_graft_log`
  * commit log. Reads resolve the requested version's directory; nothing is
  * ever rewritten in place, so concurrent readers of version N are never
  * disturbed by a writer producing N+1 — the Delta paper's core trick
  * (VLDB'20), with the log as the source of truth.
  *
  * At 100 TB: snapshots share nothing (no copy-on-write dedup) — that is
  * the storage trade-off vs Delta's file-level reuse; `vacuum` bounds it.
  *
  * Concurrency: commit-log appends are atomic ([[CommitLog.append]]
  * races put-if-absent version files), and snapshot PRODUCTION is now
  * race-safe too: every write lands its data in a private `_tmp_{uuid}`
  * directory first, then claims a version number by atomically renaming
  * it to `_v{N}` — rename-if-absent fails for exactly one of two racers
  * (HDFS/local-FS semantics), the loser re-reads `latestVersion` and
  * retries the RENAME ONLY (the data is already written, so the race
  * costs metadata, not a second copy). Writers in one JVM serialize the
  * claim under a per-path lock (the local-FS rename-into-missing-dest
  * TOCTOU, same reasoning as [[CommitLog]]'s commit lock). Object
  * stores without atomic rename need a coordinating LogStore — Delta's
  * own constraint. Concurrent READERS are always safe (snapshots are
  * immutable once named).
  */
final class VersionedLakeTable(spark: SparkSession, val path: String) {

  private val log = new Path(path, LakeTable.LogDirName)

  private def fs = log.getFileSystem(spark.sessionState.newHadoopConf())

  private def versionDir(v: Long): String = s"$path/_v$v"

  /** Highest committed data version, -1 if none. */
  def latestVersion: Long = {
    val f = fs
    if (!f.exists(new Path(path))) -1L
    else
      f.listStatus(new Path(path))
        .map(_.getPath.getName)
        .filter(_.matches("_v\\d+"))
        .map(_.stripPrefix("_v").toLong)
        .foldLeft(-1L)(math.max)
  }

  def write(df: DataFrame): VersionedLakeTable = {
    publishSnapshot(df, "WRITE", Map.empty)
    this
  }

  /** Land `df` as the next snapshot, race-safely: data goes to a private
    * tmp dir once, then a version number is CLAIMED by renaming it to
    * `_v{N}` — the loser of a race re-reads latestVersion and retries
    * only the (metadata) rename. The commit record carries the claimed
    * version. Returns the version.
    */
  private def publishSnapshot(
      df: DataFrame, op: String, params: Map[String, String]): Long = {
    val tmp = new Path(path,
      "_tmp_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    df.write.mode("overwrite").parquet(tmp.toString)
    val v = claimVersion(tmp)
    commit(op, params + ("dataVersion" -> v.toString))
    v
  }

  private def claimVersion(tmp: Path): Long = {
    val f = fs
    // per-path JVM lock: local-FS rename into an EXISTING dir NESTS
    // instead of failing, so same-JVM racers must serialize the
    // exists-check+rename pair (cross-JVM atomicity is the filesystem's
    // rename contract — HDFS fails on existing dest; object stores need
    // a LogStore, Delta's own constraint)
    VersionedLakeTable.claimLocks
      .computeIfAbsent(path, _ => new Object).synchronized {
        var attempts = 0
        while (attempts < 100) {
          val v = latestVersion + 1
          val dest = new Path(versionDir(v))
          if (!f.exists(dest) && f.rename(tmp, dest)) return v
          attempts += 1
        }
        throw new IllegalStateException(
          s"lost 100 consecutive snapshot-version races at $path")
      }
  }

  /** Latest snapshot. */
  def read: DataFrame = {
    val v = latestVersion
    require(v >= 0, s"no committed versions at $path")
    spark.read.parquet(versionDir(v))
  }

  /** Time travel: read snapshot `v` exactly as written. */
  def readVersion(v: Long): DataFrame = {
    require(fs.exists(new Path(versionDir(v))), s"version $v does not exist")
    spark.read.parquet(versionDir(v))
  }

  /** Resolve the data version that was current at `ts` — the latest
    * commit carrying a `dataVersion` whose timestamp is <= ts (Delta
    * `TIMESTAMP AS OF` semantics, resolved from the same history that
    * DESCRIBE HISTORY surfaces). The log is O(commits) tiny, so the
    * resolution is a driver-side scan of a few KB of JSON.
    */
  def versionAsOf(ts: java.time.Instant): Long = {
    val rows = history
      .where(col("operationParameters.dataVersion").isNotNull)
      .select(col("timestamp"),
        col("operationParameters.dataVersion").cast("long").as("dv"))
      .collect()
    require(rows.nonEmpty, s"no committed versions at $path")
    val eligible = rows.filter(r =>
      java.time.Instant.parse(r.getString(0)).compareTo(ts) <= 0)
    require(eligible.nonEmpty, {
      // parse before min: ISO-8601 instants have variable fractional
      // precision, so lexicographic min can name the wrong commit
      val first = rows.map(r => java.time.Instant.parse(r.getString(0))).min
      s"timestamp $ts predates the first commit ($first) at $path"
    })
    eligible.map(_.getLong(1)).max
  }

  /** Time travel by timestamp: the snapshot current at `ts`. A vacuumed
    * snapshot resolves but fails in [[readVersion]] with a clear error —
    * same contract as Delta after VACUUM.
    */
  def readAsOf(ts: java.time.Instant): DataFrame = readVersion(versionAsOf(ts))

  /** ISO-8601 convenience overload (`2026-08-12T17:00:00Z`). */
  def readAsOf(ts: String): DataFrame = readAsOf(java.time.Instant.parse(ts))

  /** Cluster into a NEW version (old snapshots remain readable). */
  def optimize(zorderBy: Seq[String], numFiles: Option[Int] = None): VersionedLakeTable = {
    val n = numFiles.getOrElse(spark.sessionState.conf.numShufflePartitions)
    publishSnapshot(
      read
        .repartitionByRange(n, zorderBy.map(col): _*)
        .sortWithinPartitions(zorderBy.map(col): _*),
      "OPTIMIZE", Map("zOrderBy" -> zorderBy.mkString(",")))
    this
  }

  /** DELETE as a NEW version: survivors of `cond` (TRUE deletes; false
    * or NULL keeps — SQL three-valued semantics, same as
    * [[LakeTable.delete]]) become snapshot N+1, while snapshot N stays
    * readable and restorable — the history-preserving DML this layout
    * buys over the plain table's staged rewrite.
    */
  def delete(cond: org.apache.spark.sql.Column): VersionedLakeTable = {
    publishSnapshot(read.where(!coalesce(cond, lit(false))),
      "DELETE", Map("predicate" -> cond.toString))
    this
  }

  /** UPDATE as a NEW version: rows where `cond` is TRUE get every SET
    * column replaced (expressions see the pre-update row; values cast to
    * the existing column type, like [[LakeTable.update]]).
    */
  def update(
      set: Map[String, org.apache.spark.sql.Column],
      cond: org.apache.spark.sql.Column): VersionedLakeTable = {
    val cur = read
    val bad = set.keys.filterNot(cur.columns.contains)
    require(set.nonEmpty && bad.isEmpty,
      s"UPDATE SET references unknown columns: ${bad.mkString(", ")}")
    val hit = coalesce(cond, lit(false))
    publishSnapshot(
      cur.select(cur.schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) => when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None    => col(f.name)
        }
      }.toIndexedSeq: _*),
      "UPDATE", Map("predicate" -> cond.toString,
        "set" -> set.keys.toSeq.sorted.mkString(",")))
    this
  }

  /** Delta-style RESTORE: make snapshot `v` current again by writing it
    * as a NEW version (history is append-only — a restore never erases
    * the versions after `v`, so a bad restore is itself restorable).
    */
  def restore(v: Long): VersionedLakeTable = {
    val snapshot = readVersion(v) // validates existence
    publishSnapshot(snapshot, "RESTORE", Map("restoredVersion" -> v.toString))
    this
  }

  /** RESTORE to the snapshot current at `ts` (TIMESTAMP AS OF form). */
  def restoreAsOf(ts: java.time.Instant): VersionedLakeTable = restore(versionAsOf(ts))

  /** Drop all but the newest `keepLast` snapshots (keepLast >= 1: the
    * latest snapshot is never vacuumable — a zero/negative keepLast would
    * silently delete the whole table).
    */
  def vacuum(keepLast: Int): VersionedLakeTable = {
    val f = fs
    vacuumDryRun(keepLast).foreach { v =>
      f.delete(new Path(versionDir(v)), true)
    }
    dropTmpDebris()
    commit("VACUUM", Map("keepLast" -> keepLast.toString))
    this
  }

  /** The snapshot versions [[vacuum]] would drop — Delta's `VACUUM …
    * DRY RUN`: inspect the blast radius before committing to it. Only
    * versions whose directory still exists are listed (already-vacuumed
    * ones are not re-reported).
    */
  def vacuumDryRun(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs
    (0L to latestVersion - keepLast)
      .filter(v => f.exists(new Path(versionDir(v))))
  }

  /** `_tmp_{uuid}` dirs left by a writer that crashed between its data
    * write and its version claim — invisible to every read (underscore
    * prefix, never matches `_v\d+`), reclaimed here. Only dirs older
    * than a retention horizon are touched (Delta's vacuum treatment of
    * uncommitted files): a vacuum racing a LIVE concurrent snapshot
    * writer must not delete its in-flight `_tmp_` data — the writer
    * would then spin its rename loop against a vanished source and fail
    * with a misleading lost-the-race error. A crashed writer's debris is
    * by definition old; hours of slack loses nothing.
    */
  private def dropTmpDebris(): Unit = {
    val f = fs
    if (!f.exists(new Path(path))) return
    val horizon =
      System.currentTimeMillis() - VersionedLakeTable.TmpDebrisRetentionMs
    f.listStatus(new Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_tmp_"))
      .filter(_.getModificationTime < horizon)
      .foreach(st => f.delete(st.getPath, true): Unit)
  }

  /** Time-based retention (Delta's operational idiom: `VACUUM … RETAIN
    * 168 HOURS`): drop every snapshot that stopped being CURRENT before
    * `now - hours` — eligibility keys off the timestamp of the commit
    * that SUPERSEDED the snapshot, so any reader that started inside the
    * retention window still finds its version. The latest snapshot is
    * never vacuumable (hours = 0 degenerates to keep-latest-only). The
    * horizon resolves through the commit log's own timestamps — no
    * filesystem mtimes, which object stores skew. `clock` is injectable
    * for tests.
    */
  def vacuumRetainHours(
      hours: Double,
      clock: () => java.time.Instant = () => java.time.Instant.now()): VersionedLakeTable = {
    require(hours >= 0, s"RETAIN hours must be >= 0, got $hours")
    val horizon = clock().minusMillis((hours * 3600 * 1000).toLong)
    // (dataVersion, commit timestamp) in commit order: entry i was
    // superseded at entry i+1's timestamp
    val rows = history
      .where(col("operationParameters.dataVersion").isNotNull)
      .select(col("operationParameters.dataVersion").cast("long").as("dv"),
        col("timestamp"))
      .collect()
      .map(r => (r.getLong(0), java.time.Instant.parse(r.getString(1))))
      .sortBy(_._1)
    val latest = latestVersion
    val f = fs
    rows.sliding(2).foreach {
      case Array((v, _), (_, supersededAt)) =>
        if (v != latest && supersededAt.isBefore(horizon))
          f.delete(new Path(versionDir(v)), true): Unit
      case _ => ()
    }
    commit("VACUUM", Map("retainHours" -> hours.toString))
    this
  }

  /** [[vacuumRetainHours]]'s DRY RUN: the versions the time horizon
    * would drop, computed from the same superseded-at timestamps,
    * deleting nothing and committing nothing.
    */
  def vacuumRetainHoursDryRun(
      hours: Double,
      clock: () => java.time.Instant = () => java.time.Instant.now()): Seq[Long] = {
    require(hours >= 0, s"RETAIN hours must be >= 0, got $hours")
    val horizon = clock().minusMillis((hours * 3600 * 1000).toLong)
    val rows = history
      .where(col("operationParameters.dataVersion").isNotNull)
      .select(col("operationParameters.dataVersion").cast("long").as("dv"),
        col("timestamp"))
      .collect()
      .map(r => (r.getLong(0), java.time.Instant.parse(r.getString(1))))
      .sortBy(_._1)
    val latest = latestVersion
    val f = fs
    rows.sliding(2).toSeq.flatMap {
      case Array((v, _), (_, supersededAt))
        if v != latest && supersededAt.isBefore(horizon) &&
          f.exists(new Path(versionDir(v))) => Some(v)
      case _ => None
    }
  }

  def history: DataFrame = CommitLog.history(spark, fs, path, log)

  private def commit(op: String, params: Map[String, String]): Unit = {
    CommitLog.append(fs, log, op, params): Unit
    // interop mirror AFTER the commit, the plain layout's contract
    // (LakeTable.commit): under the auto property every snapshot commit
    // — RESTORE included — republishes the head-snapshot manifest, so
    // external symlink readers track restores continuously
    LakeTable(spark, path).maintainSymlinkManifest()
  }
}

object VersionedLakeTable {

  /** How old a `_tmp_` staging dir must be before vacuum reclaims it
    * (mutable only for tests — aging a real dir needs setTimes anyway).
    */
  private[sources] var TmpDebrisRetentionMs: Long = 4L * 3600 * 1000

  /** Per-table-path snapshot-claim locks (see [[VersionedLakeTable.claimVersion]]). */
  private val claimLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Whether `path` holds the versioned `_v{N}` snapshot layout (vs the
    * plain [[LakeTable]] flat layout) — the SQL DML commands route on
    * this so one statement surface serves both table kinds.
    */
  def isVersioned(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    f.exists(p) && f.listStatus(p).exists(_.getPath.getName.matches("_v\\d+"))
  }

  def apply(spark: SparkSession, path: String): VersionedLakeTable =
    new VersionedLakeTable(spark, path)
}
