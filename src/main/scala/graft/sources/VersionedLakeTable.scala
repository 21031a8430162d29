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
    val v = latestVersion + 1
    df.write.mode("overwrite").parquet(versionDir(v))
    commit("WRITE", Map("dataVersion" -> v.toString))
    this
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

  /** Cluster into a NEW version (old snapshots remain readable). */
  def optimize(zorderBy: Seq[String], numFiles: Option[Int] = None): VersionedLakeTable = {
    val n = numFiles.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val v = latestVersion + 1
    read
      .repartitionByRange(n, zorderBy.map(col): _*)
      .sortWithinPartitions(zorderBy.map(col): _*)
      .write.mode("overwrite").parquet(versionDir(v))
    commit("OPTIMIZE",
      Map("dataVersion" -> v.toString, "zOrderBy" -> zorderBy.mkString(",")))
    this
  }

  /** Drop all but the newest `keepLast` snapshots (keepLast >= 1: the
    * latest snapshot is never vacuumable — a zero/negative keepLast would
    * silently delete the whole table).
    */
  def vacuum(keepLast: Int): VersionedLakeTable = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val latest = latestVersion
    val f = fs
    (0L to latest - keepLast).foreach { v =>
      f.delete(new Path(versionDir(v)), true)
    }
    commit("VACUUM", Map("keepLast" -> keepLast.toString))
    this
  }

  def history: DataFrame = CommitLog.history(spark, fs, path, log)

  private def commit(op: String, params: Map[String, String]): Unit =
    CommitLog.append(fs, log, op, params)
}

object VersionedLakeTable {
  def apply(spark: SparkSession, path: String): VersionedLakeTable =
    new VersionedLakeTable(spark, path)
}
