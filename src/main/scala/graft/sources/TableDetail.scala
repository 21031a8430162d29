package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `DESCRIBE DETAIL` analogue (Delta's one-row table-metadata query,
  * reference surface: the notebooks' table-inspection cells): a single
  * row of layout kind, data-file/byte counts, commit count, the
  * authoritative schema, and the active constraints. Pure driver-side
  * filesystem METADATA — no data files are opened, so it costs O(files)
  * listing however large the table is.
  */
object TableDetail {

  def describe(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val versioned = VersionedLakeTable.isVersioned(spark, path)
    var files = 0L
    var bytes = 0L
    var dvDirs = 0L
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath
        if (st.getPath.getName.endsWith(".parquet") &&
          !rel.contains("/" + LakeTable.LogDirName + "/") &&
          !rel.contains("/" + LakeTable.ChangesDirName + "/") &&
          !rel.contains("/" + LakeTable.StatsDirName + "/") &&
          !rel.contains("/" + LakeTable.DvDirName + "/")) {
          files += 1
          bytes += st.getLen
        }
      }
      val dvRoot = new Path(p, LakeTable.DvDirName)
      if (fs.exists(dvRoot)) dvDirs = fs.listStatus(dvRoot).length.toLong
    }
    val logDir = new Path(p, LakeTable.LogDirName)
    val commits = CommitLog.currentCount(fs, logDir)
    val (schemaJson, cons) =
      if (versioned) {
        val t = VersionedLakeTable(spark, path)
        (if (t.latestVersion >= 0) t.read.schema.json else null, Map.empty[String, String])
      } else {
        val t = LakeTable(spark, path)
        (t.tableSchema.map(_.json).orNull, t.constraints)
      }
    val partCols =
      if (versioned) ""
      else LakeTable(spark, path).partitionColumns().mkString(",")
    // Delta DESCRIBE DETAIL parity columns users script against:
    // createdAt / lastModified from the commit timestamps (one log read,
    // already O(commits)); properties verbatim; clusteringColumns from
    // the most recent OPTIMIZE commit's recorded dimensions
    // commits predating the timestamp field parse as timestamp = "" —
    // DESCRIBE DETAIL consumers must see null (absent value), not ""
    val recs = CommitLog.recordsSince(fs, logDir, 0L)
    val createdAt = recs.headOption.map(_.timestamp).filter(_.nonEmpty).orNull
    val lastModified = recs.lastOption.map(_.timestamp).filter(_.nonEmpty).orNull
    val clusterCols = recs.reverseIterator
      .find(r => r.operation.startsWith("OPTIMIZE"))
      .flatMap(r => r.params.get("zOrderBy").orElse(r.params.get("cols")))
      .getOrElse("")
    val props =
      if (versioned) ""
      else LakeTable(spark, path).tableProperties.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString("; ")
    Seq((
      path,
      if (versioned) "versioned" else "lake",
      "parquet",
      files, bytes, commits,
      schemaJson,
      cons.toSeq.sorted.map { case (k, v) => s"$k CHECK ($v)" }.mkString("; "),
      dvDirs,
      partCols,
      clusterCols,
      createdAt,
      lastModified,
      props
    )).toDF("path", "layout", "format", "num_files", "size_bytes",
      "num_commits", "schema_json", "constraints", "num_deletion_vectors",
      "partition_columns", "clustering_columns", "created_at",
      "last_modified", "properties")
  }
}
