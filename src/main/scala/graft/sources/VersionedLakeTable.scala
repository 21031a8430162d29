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
    commit(v, "WRITE", Map("dataVersion" -> v.toString))
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
    commit(v, "OPTIMIZE",
      Map("dataVersion" -> v.toString, "zOrderBy" -> zorderBy.mkString(",")))
    this
  }

  /** Drop all but the newest `keepLast` snapshots. */
  def vacuum(keepLast: Int): VersionedLakeTable = {
    val latest = latestVersion
    val f = fs
    (0L to latest - keepLast).foreach { v =>
      f.delete(new Path(versionDir(v)), true)
    }
    commit(latest, "VACUUM", Map("keepLast" -> keepLast.toString))
    this
  }

  def history: DataFrame =
    spark.read.json(s"$path/${LakeTable.LogDirName}/*.json")
      .orderBy(col("version").desc)

  private def commit(dataVersion: Long, op: String, params: Map[String, String]): Unit = {
    val f = fs
    if (!f.exists(log)) f.mkdirs(log)
    val commitId =
      f.listStatus(log).count(_.getPath.getName.endsWith(".json")).toLong
    val paramJson = params.toSeq.sortBy(_._1)
      .map { case (k, w) => s""""$k":"$w"""" }.mkString("{", ",", "}")
    val ts = java.time.Instant.now().toString
    val json =
      s"""{"version":$commitId,"timestamp":"$ts","operation":"$op","operationParameters":$paramJson}"""
    val out = f.create(new Path(log, f"$commitId%020d.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

object VersionedLakeTable {
  def apply(spark: SparkSession, path: String): VersionedLakeTable =
    new VersionedLakeTable(spark, path)
}
