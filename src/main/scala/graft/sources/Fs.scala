package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem utilities (SURVEY §2 A10) — the `dbutils.fs.ls/rm` surface
  * (reference 00-etl-rwd.py:36,43,91) over the Hadoop FileSystem API, so
  * the same calls work on local disk, HDFS, or object stores.
  */
object Fs {

  case class Entry(path: String, name: String, size: Long, isDir: Boolean)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def ls(spark: SparkSession, path: String): Seq[Entry] =
    fs(spark, path).listStatus(new Path(path)).toSeq.map { st =>
      Entry(st.getPath.toString, st.getPath.getName, st.getLen, st.isDirectory)
    }.sortBy(_.name)

  def rm(spark: SparkSession, path: String, recursive: Boolean = false): Boolean =
    fs(spark, path).delete(new Path(path), recursive)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def mkdirs(spark: SparkSession, path: String): Boolean =
    fs(spark, path).mkdirs(new Path(path))
}
