package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared commit-log machinery for [[LakeTable]] and
  * [[VersionedLakeTable]] — one JSON file per commit under
  * `_graft_log/`, ordered by a zero-padded commit id.
  */
private[sources] object CommitLog {

  def currentCount(fs: FileSystem, logDir: Path): Long =
    if (!fs.exists(logDir)) 0L
    else fs.listStatus(logDir).count(_.getPath.getName.endsWith(".json")).toLong

  private[sources] def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Append one commit record; version = running commit count. */
  def append(fs: FileSystem, logDir: Path, op: String, params: Map[String, String]): Unit = {
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val v = currentCount(fs, logDir)
    val paramJson = params.toSeq.sortBy(_._1)
      .map { case (k, w) => s""""${esc(k)}":"${esc(w)}"""" }
      .mkString("{", ",", "}")
    val ts = java.time.Instant.now().toString
    val json =
      s"""{"version":$v,"timestamp":"$ts","operation":"$op","operationParameters":$paramJson}"""
    val out = fs.create(new Path(logDir, f"$v%020d.json"), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** History DataFrame; stable empty shape for fresh tables (see
    * [[LakeTable.history]] for the operationParameters caveat).
    */
  def history(spark: SparkSession, fs: FileSystem, tablePath: String, logDir: Path): DataFrame =
    if (!fs.exists(logDir)) {
      import spark.implicits._
      Seq.empty[(Long, String, String)].toDF("version", "operation", "timestamp")
    } else {
      spark.read.json(s"$tablePath/${LakeTable.LogDirName}/*.json")
        .orderBy(col("version").desc)
    }
}
