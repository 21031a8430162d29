package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SQL-reachable admin surface's COLUMN CONTRACT — the set
  * users script against (the Delta DESCRIBE DETAIL / DESCRIBE HISTORY
  * parity sweep): graft_detail's one metadata row and graft_history's
  * per-commit rows. A rename or drop here breaks downstream scripts
  * silently, so the exact sets are asserted, not just membership.
  */
class TableDetailSpec extends SparkSpec {
  import spark.implicits._

  test("graft_detail column contract + Delta-parity fields populated") {
    val dir = Files.createTempDirectory("graft_detail").toString + "/t"
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "x", "v"))
    lake.write(Seq((3L, 30.0, "c")).toDF("id", "x", "v"), SaveMode.Append)
    lake.addConstraint("x_pos", "x > 0"): Unit
    lake.setTableProperty("owner", "team-data"): Unit
    lake.optimize(Seq("id"), numFiles = Some(1)): Unit

    val d = TableDetail.describe(spark, dir)
    assert(d.columns.toSeq === Seq("path", "layout", "format", "num_files",
      "size_bytes", "num_commits", "schema_json", "constraints",
      "num_deletion_vectors", "partition_columns", "clustering_columns",
      "created_at", "last_modified", "properties"),
      s"graft_detail column contract drifted: ${d.columns.toSeq}")
    val row = d.head()
    assert(row.getAs[String]("layout") === "lake")
    assert(row.getAs[String]("format") === "parquet")
    assert(row.getAs[Long]("num_files") >= 1L)
    assert(row.getAs[Long]("size_bytes") > 0L)
    assert(row.getAs[Long]("num_commits") >= 4L)
    assert(row.getAs[String]("constraints").contains("x_pos"))
    assert(row.getAs[String]("clustering_columns") === "id")
    assert(row.getAs[String]("properties").contains("owner=team-data"))
    // timestamps: present, ISO-sortable, created <= modified
    val created = row.getAs[String]("created_at")
    val modified = row.getAs[String]("last_modified")
    assert(created != null && modified != null && created <= modified,
      s"created_at=$created last_modified=$modified")
    // SQL spelling reaches the same row shape
    val viaSql = spark.sql(s"SELECT * FROM graft_detail('$dir')")
    assert(viaSql.columns.toSeq === d.columns.toSeq)
  }

  test("graft_history column contract") {
    val dir = Files.createTempDirectory("graft_hist").toString + "/t"
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, "a")).toDF("id", "v"))
    lake.write(Seq((2L, "b")).toDF("id", "v"), SaveMode.Append)
    val h = lake.history
    assert(Set("version", "operation", "timestamp")
      .subsetOf(h.columns.toSet),
      s"graft_history lost a contract column: ${h.columns.toSeq}")
    assert(h.columns.contains("operationParameters"),
      "operationParameters column missing from history")
    // newest first, contiguous versions
    val versions = h.select("version").as[Long].collect().toSeq
    assert(versions === versions.sorted.reverse)
    // timestamps ISO-sortable ascending with version
    val byV = h.orderBy("version")
      .select("timestamp").as[String].collect().toSeq
    assert(byV === byV.sorted, s"history timestamps not monotone: $byV")
  }

  test("created_at/last_modified are NULL, not empty, for legacy logs without timestamps") {
    // commits predating the timestamp field parse as "" — DESCRIBE DETAIL
    // consumers must get null (an absent value), not an empty string
    val dir = Files.createTempDirectory("graft_detail_legacy").toString + "/t"
    LakeTable(spark, dir).write(Seq((1L, "a")).toDF("id", "v").coalesce(1)): Unit
    val logDir = new java.io.File(dir, LakeTable.LogDirName)
    logDir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val stripped = txt.replaceAll("\"timestamp\":\"[^\"]*\",", "")
      java.nio.file.Files.write(f.toPath, stripped.getBytes("UTF-8")): Unit
    }
    val row = TableDetail.describe(spark, dir).head()
    assert(row.getAs[String]("created_at") == null,
      s"expected null created_at, got '${row.getAs[String]("created_at")}'")
    assert(row.getAs[String]("last_modified") == null,
      s"expected null last_modified, got '${row.getAs[String]("last_modified")}'")
  }
}
