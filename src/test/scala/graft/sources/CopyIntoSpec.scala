package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Idempotent file ingest (LakeTable.copyInto / SQL COPY INTO): loaded
  * files never load twice, NEW files in the same source do load, and the
  * loaded-set tracking survives crashes via commit-claimed ledgers.
  */
class CopyIntoSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_copytest").resolve(name).toString

  test("re-running the same COPY INTO is a no-op") {
    val n = Tables(spark, sf0001).nation
    val src = tmp("src")
    n.write.parquet(src)
    val lake = LakeTable(spark, tmp("t"))
    lake.copyInto(src)
    assert(lake.read.count() === n.count())
    lake.copyInto(src)
    assert(lake.read.count() === n.count(), "second copy must load nothing")
    // exactly one data-bearing commit carries a ledger claim
    assert(lake.history.where(
      col("operationParameters.copyLedger").isNotNull).count() === 1)
  }

  test("new files in the source load incrementally") {
    val o = Tables(spark, sf0001).orders
    val src = tmp("src")
    val first = o.where(col("o_orderkey") % 2 === 0)
    val second = o.where(col("o_orderkey") % 2 === 1)
    first.write.parquet(src)
    val lake = LakeTable(spark, tmp("t"))
    lake.copyInto(src)
    assert(lake.read.count() === first.count())
    // drop more files into the SAME source dir (distinct part names)
    second.write.mode("append").parquet(src)
    lake.copyInto(src)
    assert(lake.read.count() === o.count())
    val loaded = lake.history
      .where(col("operationParameters.filesLoaded").isNotNull)
      .select("operationParameters.filesLoaded")
      .collect().map(_.getString(0).toInt)
    assert(loaded.length === 2 && loaded.sum ===
      lake.copiedFiles.size, s"per-commit file counts must sum: ${loaded.toSeq}")
  }

  test("COPY INTO … WITH QUARANTINE: ledgered split, idempotent re-run, SQL errors") {
    val s = spark
    import s.implicits._
    val src = tmp("srcq")
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.write(java.nio.file.Paths.get(src, "a.jsonl"), Seq(
      """{"id": 1, "t": "ok"}""",
      """broken line""",
      """{"id": "nope", "t": "bad type"}""").mkString("\n").getBytes("UTF-8"))
    val dir = tmp("t")
    spark.sql(
      s"""COPY INTO graft_lake('$dir') FROM '$src'
         |FILEFORMAT = JSONL SCHEMA 'id BIGINT, t STRING' WITH QUARANTINE""".stripMargin)
    val lake = LakeTable(spark, dir)
    assert(lake.read.as[(Long, String)].collect().toSeq === Seq((1L, "ok")))
    assert(lake.quarantine.read.select("raw_line").as[String].collect().toSet ===
      Set("broken line", """{"id": "nope", "t": "bad type"}"""))
    // re-run: the ledger marks the file loaded — neither leg grows
    spark.sql(
      s"""COPY INTO graft_lake('$dir') FROM '$src'
         |FILEFORMAT = JSONL SCHEMA 'id BIGINT, t STRING' WITH QUARANTINE""".stripMargin)
    assert(lake.read.count() === 1 && lake.quarantine.read.count() === 2)
    // a LATE file loads incrementally, both legs
    Files.write(java.nio.file.Paths.get(src, "b.jsonl"), Seq(
      """{"id": 2, "t": "late"}""", """also broken""").mkString("\n").getBytes("UTF-8"))
    spark.sql(
      s"""COPY INTO graft_lake('$dir') FROM '$src'
         |FILEFORMAT = JSONL SCHEMA 'id BIGINT, t STRING' WITH QUARANTINE""".stripMargin)
    assert(lake.read.select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(lake.quarantine.read.count() === 3)
    // grammar guards: quarantine needs JSONL + SCHEMA; plain COPY refuses SCHEMA
    val e1 = intercept[Exception](spark.sql(
      s"COPY INTO graft_lake('$dir') FROM '$src' FILEFORMAT = PARQUET WITH QUARANTINE"))
    assert(e1.getMessage.contains("JSONL"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"COPY INTO graft_lake('$dir') FROM '$src' FILEFORMAT = JSONL WITH QUARANTINE"))
    assert(e2.getMessage.contains("SCHEMA"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      s"COPY INTO graft_lake('$dir') FROM '$src' FILEFORMAT = JSONL SCHEMA 'id BIGINT'"))
    assert(e3.getMessage.contains("QUARANTINE"), e3.getMessage)
  }

  test("SQL COPY INTO routes with FILEFORMAT and works on named tables") {
    val n = Tables(spark, sf0001).nation
    val src = tmp("srcjson")
    n.write.json(src)
    val dir = tmp("t")
    val lake = LakeTable(spark, dir)
    // registration analyzes the path's schema, so seed the (empty) table
    // before naming it — the CREATE TABLE ... LOCATION flow does the same
    lake.write(n.limit(0))
    LakeNames.register(spark, "copy_db", "tgt", dir)
    spark.sql(s"COPY INTO copy_db.tgt FROM '$src' FILEFORMAT = JSON")
    assert(lake.read.count() === n.count())
    spark.sql(s"COPY INTO copy_db.tgt FROM '$src' FILEFORMAT = JSON")
    assert(lake.read.count() === n.count())
  }

  test("an unclaimed ledger does not count files as loaded; vacuum removes it") {
    val n = Tables(spark, sf0001).nation
    val src = tmp("src")
    n.write.parquet(src)
    val lake = LakeTable(spark, tmp("t"))
    lake.copyInto(src)
    // simulate a crash between ledger write and commit: an extra ledger
    // listing a FICTIONAL source file, never claimed by any commit
    val fs = new Path(lake.path).getFileSystem(spark.sessionState.newHadoopConf())
    val phantom = new Path(lake.path + "/" + LakeTable.LogDirName, "_copied_phantom")
    val out = fs.create(phantom, false)
    try out.write(s"$src/never-loaded.parquet".getBytes("UTF-8"))
    finally out.close()
    assert(!lake.copiedFiles.contains(s"$src/never-loaded.parquet"))
    lake.vacuumDebris()
    assert(!fs.exists(phantom))
    // the CLAIMED ledger survives vacuum and still blocks re-copy
    lake.copyInto(src)
    assert(lake.read.count() === n.count())
  }

  test("copied set survives an overwrite of the table") {
    val n = Tables(spark, sf0001).nation
    val src = tmp("src")
    n.write.parquet(src)
    val lake = LakeTable(spark, tmp("t"))
    lake.copyInto(src)
    lake.write(n.limit(3)) // overwrite; log (and ledgers) preserved
    lake.copyInto(src)
    assert(lake.read.count() === 3,
      "already-loaded files must not re-load after an overwrite")
  }

  test("COPY INTO a versioned-layout table is rejected (appends would be invisible)") {
    import spark.implicits._
    val src = tmp("src_versioned")
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(src)
    val vt = VersionedLakeTable(spark, tmp("vt"))
    vt.write(Seq((9L, "z")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      LakeTable(spark, vt.path).copyInto(src)
    }
    assert(e.getMessage.contains("versioned"))
    assert(vt.read.count() === 1, "the snapshot must be untouched")
  }
}
