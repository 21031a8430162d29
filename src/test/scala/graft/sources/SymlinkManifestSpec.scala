package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SymlinkManifestSpec extends SparkSpec {

  import spark.implicits._

  private def manifestLines(spark: org.apache.spark.sql.SparkSession, m: String): Seq[String] =
    spark.read.textFile(m).collect().toSeq

  test("flat table: one root manifest listing exactly the live data files") {
    val dir = Files.createTempDirectory("graft_symlink").toString
    val lake = LakeTable(spark, s"$dir/t")
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val manifests = lake.generateSymlinkManifest()
    assert(manifests.length === 1 && manifests.head.endsWith(
      "_symlink_format_manifest/manifest"))
    val listed = manifestLines(spark, manifests.head)
    // an EXTERNAL reader (plain parquet over the listed files) sees the
    // exact table content — the whole point of the handshake
    val external = spark.read.parquet(listed: _*)
    assert(external.orderBy("id").as[(Long, String)].collect().toSeq ===
      lake.read.orderBy("id").as[(Long, String)].collect().toSeq)
    // regenerating after a rewrite re-points at the NEW files
    lake.compact()
    val after = manifestLines(spark, lake.generateSymlinkManifest().head)
    assert(after.toSet.intersect(listed.toSet).isEmpty,
      "manifest must not keep pre-compaction files")
    assert(spark.read.parquet(after: _*).count() === 2L)
  }

  test("partitioned table: one manifest per partition dir") {
    val dir = Files.createTempDirectory("graft_symlink2").toString
    val lake = LakeTable(spark, s"$dir/t").writePartitioned(
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("p", "id"), Seq("p"))
    val manifests = lake.generateSymlinkManifest().sorted
    assert(manifests.length === 2, manifests)
    assert(manifests.exists(_.contains("p=a")) && manifests.exists(_.contains("p=b")))
    // partition values are NOT in the data files (Hive layout), so the
    // external reader reads each partition's manifest knowing its value
    val aRows = spark.read.parquet(manifestLines(spark, manifests.find(_.contains("p=a")).get): _*)
    assert(aRows.select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("refuses deletion vectors and shallow clones; SQL spelling works") {
    val dir = Files.createTempDirectory("graft_symlink3").toString
    val lake = LakeTable(spark, s"$dir/t")
    lake.write((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x"))
    // SQL spelling returns the manifest paths as rows
    val viaSql = spark.sql(
      s"GENERATE symlink_format_manifest FOR TABLE graft_lake('$dir/t')")
      .as[String].collect().toSeq
    assert(viaSql.length === 1 && viaSql.head.endsWith("manifest"))
    // deletion vectors: an external reader would resurrect deleted rows
    lake.deleteVectored(col("id") > 8)
    val e = intercept[IllegalArgumentException](lake.generateSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // a full rewrite materializes the deletes and re-arms GENERATE
    lake.compact()
    val after = lake.generateSymlinkManifest()
    assert(spark.read.parquet(manifestLines(spark, after.head): _*).count() === 8L)
    // shallow clone: files live in the source table
    val clone = lake.cloneTo(s"$dir/c", shallow = true)
    val e2 = intercept[IllegalArgumentException](clone.generateSymlinkManifest())
    assert(e2.getMessage.contains("materialize"), e2.getMessage)
  }

  test("versioned layout: HEAD-snapshot manifest round-trips across a RESTORE") {
    val dir = Files.createTempDirectory("graft_symlink4").toString
    val vt = VersionedLakeTable(spark, s"$dir/v")
      .write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val m1 = LakeTable(spark, s"$dir/v").generateSymlinkManifest()
    assert(m1.length === 1)
    // the manifest is the CURRENT snapshot's files — an external plain
    // parquet reader sees exactly what vt.read sees
    assert(spark.read.parquet(manifestLines(spark, m1.head): _*)
      .orderBy("id").as[(Long, String)].collect().toSeq ===
      vt.read.orderBy("id").as[(Long, String)].collect().toSeq)
    // under the auto property, every snapshot commit — DELETE and
    // RESTORE included — republishes the manifest, so the external view
    // tracks restores with no manual GENERATE
    spark.sql(s"ALTER TABLE graft_lake('$dir/v') SET TBLPROPERTIES " +
      s"('${LakeTable.SymlinkAutoProperty}' = 'true')")
    vt.delete(col("id") === 2L) // snapshot v1
    val afterDelete = manifestLines(spark,
      s"$dir/v/${LakeTable.SymlinkManifestDirName}/manifest")
    assert(spark.read.parquet(afterDelete: _*).count() === 1L)
    assert(afterDelete.forall(_.contains("/_v1/")), afterDelete)
    vt.restore(0L) // snapshot v2 = v0's content; manifest must follow
    val afterRestore = manifestLines(spark,
      s"$dir/v/${LakeTable.SymlinkManifestDirName}/manifest")
    assert(afterRestore.forall(_.contains("/_v2/")), afterRestore)
    assert(spark.read.parquet(afterRestore: _*)
      .orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // SQL spelling serves versioned tables too
    val viaSql = spark.sql(
      s"GENERATE symlink_format_manifest FOR TABLE graft_lake('$dir/v')")
      .as[String].collect().toSeq
    assert(viaSql.length === 1 && viaSql.head.endsWith("manifest"))
  }

  test("symlinkAuto property: every file-set-changing commit refreshes the manifest") {
    val dir = Files.createTempDirectory("graft_symlink5").toString
    val lake = LakeTable(spark, s"$dir/t")
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // enabling generates the initial manifest via the property's commit
    // (SQL spelling — routes through setTableProperty)
    spark.sql(s"ALTER TABLE graft_lake('$dir/t') SET TBLPROPERTIES " +
      s"('${LakeTable.SymlinkAutoProperty}' = 'true')")
    assert(lake.tableProperties(LakeTable.SymlinkAutoProperty) === "true")
    assert(spark.sql(s"SHOW TBLPROPERTIES graft_lake('$dir/t')")
      .as[(String, String)].collect().toSeq ===
      Seq(LakeTable.SymlinkAutoProperty -> "true"))
    val root = s"$dir/t/${LakeTable.SymlinkManifestDirName}/manifest"
    val initial = manifestLines(spark, root)
    assert(spark.read.parquet(initial: _*).count() === 2L)
    // append: the manifest must follow WITHOUT an explicit GENERATE
    lake.write(Seq((3L, "c")).toDF("id", "s"),
      org.apache.spark.sql.SaveMode.Append)
    val afterAppend = manifestLines(spark, root)
    assert(spark.read.parquet(afterAppend: _*).count() === 3L)
    assert(afterAppend.toSet !== initial.toSet)
    // optimize (staged swap): manifest re-points at the compacted files
    lake.compactSmall()
    val afterCompact = manifestLines(spark, root)
    assert(spark.read.parquet(afterCompact: _*)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(afterCompact.toSet.intersect(afterAppend.toSet).isEmpty,
      "manifest must not keep pre-compaction files")
    // delete: external view tracks the shrink
    lake.delete(col("id") === 1L)
    assert(spark.read.parquet(manifestLines(spark, root): _*)
      .select("id").as[Long].collect().toSet === Set(2L, 3L))
    // unset (SQL spelling): the manifest freezes (point-in-time again)
    spark.sql(s"ALTER TABLE graft_lake('$dir/t') UNSET TBLPROPERTIES " +
      s"('${LakeTable.SymlinkAutoProperty}')")
    assert(!lake.tableProperties.contains(LakeTable.SymlinkAutoProperty))
    val frozen = manifestLines(spark, root)
    lake.write(Seq((4L, "d")).toDF("id", "s"),
      org.apache.spark.sql.SaveMode.Append)
    assert(manifestLines(spark, root) === frozen)
    // enabling on a DV-bearing table is refused up front
    val lake2 = LakeTable(spark, s"$dir/t2")
    lake2.write((1L to 4L).map(i => (i, i * 1.0)).toDF("id", "x"))
    lake2.deleteVectored(col("id") > 3)
    val e = intercept[IllegalArgumentException](
      lake2.setTableProperty(LakeTable.SymlinkAutoProperty, "true"))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // ... and the mirror direction: a DV delete UNDER the property is
    // refused BEFORE mutating (a post-commit manifest failure would leave
    // external readers the stale file list the property exists to prevent)
    val lake3 = LakeTable(spark, s"$dir/t3")
    lake3.write((1L to 4L).map(i => (i, i * 1.0)).toDF("id", "x"))
    lake3.setTableProperty(LakeTable.SymlinkAutoProperty, "true")
    val e2 = intercept[IllegalArgumentException](lake3.deleteVectored(col("id") > 3))
    assert(e2.getMessage.contains("symlink"), e2.getMessage)
    assert(lake3.read.count() === 4, "refusal must precede the mutation")
    // multi-property SET is atomic: a failing pair leaves nothing applied
    val e3 = intercept[IllegalArgumentException](
      lake2.setTableProperties(Seq(
        "owner" -> "x", LakeTable.SymlinkAutoProperty -> "true")))
    assert(e3.getMessage.contains("deletion vectors"), e3.getMessage)
    assert(!lake2.tableProperties.contains("owner"),
      "a failing SET TBLPROPERTIES must apply none of its pairs")
    // malformed TBLPROPERTIES bodies fail loudly instead of half-parsing
    val e4 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_lake('$dir/t2') SET TBLPROPERTIES ('a', 'b' = '2')"))
    assert(e4.getMessage.contains("quoted"), e4.getMessage)
  }
}
