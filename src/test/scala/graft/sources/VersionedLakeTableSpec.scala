package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class VersionedLakeTableSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_vlake").resolve("t").toString

  test("time travel: old versions stay readable after new writes") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.nation) // v0
    lake.write(t.nation.where(col("n_regionkey") === 0)) // v1
    assert(lake.latestVersion === 1L)
    assert(lake.read.count() < 25)
    assert(lake.readVersion(0).count() === 25)
    assert(lake.readVersion(1).count() === lake.read.count())
  }

  test("optimize creates a new version with identical content") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp()).write(t.lineitem)
    lake.optimize(Seq("l_shipdate"), numFiles = Some(2))
    assert(lake.latestVersion === 1L)
    assert(lake.read.count() === lake.readVersion(0).count())
    val ops = lake.history.select("operation").collect().map(_.getString(0))
    assert(ops.toSet === Set("WRITE", "OPTIMIZE"))
  }

  test("vacuum drops old snapshots but keeps the newest") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.region); lake.write(t.region); lake.write(t.region)
    lake.vacuum(keepLast = 1)
    assert(lake.read.count() === 5)
    intercept[IllegalArgumentException](lake.readVersion(0))
    assert(lake.readVersion(2).count() === 5)
  }

  test("VACUUM DRY RUN lists the blast radius, deletes nothing, commits nothing") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.region); lake.write(t.region); lake.write(t.region)
    val before = lake.history.count()
    // API form
    assert(lake.vacuumDryRun(keepLast = 1) === Seq(0L, 1L))
    assert(lake.vacuumDryRun(keepLast = 3) === Seq.empty)
    // SQL form returns the versions as rows
    val rows = spark.sql(
      s"VACUUM graft_lake('${lake.path}') RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(0L, 1L))
    // nothing deleted, no commit recorded
    assert(lake.readVersion(0).count() === 5)
    assert(lake.history.count() === before)
    // hours form mirrors the destructive path's horizon, dry
    val dryHours = lake.vacuumRetainHoursDryRun(0.0)
    assert(dryHours === Seq(0L, 1L))
    assert(spark.sql(
      s"VACUUM graft_lake('${lake.path}') RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 1L))
    // then the real vacuum drops exactly what the dry run named
    lake.vacuum(keepLast = 1)
    intercept[IllegalArgumentException](lake.readVersion(0))
    assert(lake.vacuumDryRun(keepLast = 1) === Seq.empty,
      "already-vacuumed versions must not be re-reported")
  }

  test("vacuumRetainHours drops snapshots superseded before the horizon (injected clock)") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.region); lake.write(t.region); lake.write(t.region)
    // pull real commit instants — wall-clock guesses would be racy
    val ts = lake.history
      .select(col("operationParameters.dataVersion").cast("long"), col("timestamp"))
      .collect().map(r => r.getLong(0) -> java.time.Instant.parse(r.getString(1)))
      .toMap
    // horizon just after v1's commit: v0 (superseded at v1's commit) is
    // out of retention; v1 (superseded at v2's commit, inside the window)
    // and the latest v2 survive
    val now = ts(2L).plusSeconds(3600)
    // +2ms so the horizon lands STRICTLY after v1's commit even if the
    // hours->millis round-trip truncates a millisecond
    val horizonHours = (now.toEpochMilli -
      ts(1L).plusMillis(2).toEpochMilli) / 3600.0e3
    lake.vacuumRetainHours(horizonHours, clock = () => now)
    intercept[IllegalArgumentException](lake.readVersion(0))
    assert(lake.readVersion(1).count() === 5)
    assert(lake.readVersion(2).count() === 5)
    // RETAIN 0 HOURS keeps only the live snapshot
    lake.vacuumRetainHours(0.0, clock = () => java.time.Instant.now())
    intercept[IllegalArgumentException](lake.readVersion(1))
    assert(lake.read.count() === 5)
    // a huge retention window vacuums nothing further
    lake.write(t.region)
    lake.vacuumRetainHours(24 * 365)
    assert(lake.readVersion(2).count() === 5)
  }

  test("VACUUM … RETAIN n HOURS parses and runs through the SQL surface") {
    val t = Tables(spark, sf0001)
    val path = tmp()
    val lake = VersionedLakeTable(spark, path)
    lake.write(t.region); lake.write(t.region)
    spark.sql(s"VACUUM graft_lake('$path') RETAIN 9999 HOURS")
    assert(lake.readVersion(0).count() === 5) // inside the window: kept
    spark.sql(s"VACUUM graft_lake('$path') RETAIN 0 HOURS")
    intercept[IllegalArgumentException](lake.readVersion(0))
    assert(lake.read.count() === 5)
    // plain tables reject the hours form with a clear message
    val plainPath = Files.createTempDirectory("graft_vlake_plain").resolve("p").toString
    LakeTable(spark, plainPath).write(t.region)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft_lake('$plainPath') RETAIN 1 HOURS")
    }
    assert(e.getMessage.contains("versioned tables"), e.getMessage)
  }

  test("concurrent writers claim distinct snapshot versions, nothing clobbered") {
    val t = Tables(spark, sf0001)
    val path = tmp()
    VersionedLakeTable(spark, path).write(t.region) // v0: 5 rows
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 4 writers race latestVersion+1; the tmp-then-claim protocol must
    // give each its OWN version dir with intact content
    val writes = (1 to 4).map { i =>
      Future {
        VersionedLakeTable(spark, path)
          .write(t.region.limit(i)): Unit
      }
    }
    writes.foreach(Await.result(_, 120.seconds))
    val lake = VersionedLakeTable(spark, path)
    assert(lake.latestVersion === 4L)
    // every version readable; the four racer contents {1,2,3,4} all
    // landed exactly once (order between them is unspecified)
    assert(lake.readVersion(0).count() === 5)
    val sizes = (1L to 4L).map(v => lake.readVersion(v).count()).sorted
    assert(sizes === Seq(1L, 2L, 3L, 4L))
    // no tmp debris left behind by the successful claims
    val tmps = new java.io.File(path).list().count(_.startsWith("_tmp_"))
    assert(tmps === 0, s"$tmps _tmp_ dirs left behind")
    // a crashed writer's tmp dir is invisible, and vacuum reclaims it
    // only past the retention horizon — a FRESH tmp dir could be a live
    // concurrent writer's in-flight data and must survive
    val debris = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path, "_tmp_deadbeef"))
    assert(lake.read.count() > 0) // reads unaffected by the debris
    lake.vacuum(keepLast = 5)
    assert(new java.io.File(path, "_tmp_deadbeef").exists,
      "a fresh (possibly live) _tmp_ dir must not be reclaimed")
    // aged past the horizon it is debris by definition
    debris.toFile.setLastModified(
      System.currentTimeMillis() - 24L * 3600 * 1000): Unit
    lake.vacuum(keepLast = 5)
    assert(!new java.io.File(path, "_tmp_deadbeef").exists)
  }

  test("snapshot dirs are invisible to a naive root read") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp()).write(t.region)
    // _v0 and _graft_log are underscore-hidden; a raw read of the root
    // finds no data files and fails to infer a schema
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(lake.path).count()
    }
  }

  test("history on a fresh table is empty, and vacuum(0) is rejected") {
    val lake = VersionedLakeTable(spark, tmp())
    assert(lake.history.count() === 0L)
    intercept[IllegalArgumentException](lake.vacuum(0))
  }

  test("TIMESTAMP AS OF: before-first rejects, between-commits picks the earlier, after-last picks latest") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.nation)                                  // v0: 25 rows
    lake.write(t.nation.where(col("n_regionkey") === 0))  // v1: 5 rows
    // pull the actual commit instants from the log — wall-clock guesses
    // would make the test racy
    val byVersion = lake.history
      .select(col("operationParameters.dataVersion").cast("long"), col("timestamp"))
      .collect().map(r => r.getLong(0) -> java.time.Instant.parse(r.getString(1))).toMap
    val (t0, t1) = (byVersion(0L), byVersion(1L))
    // before the first commit
    val early = intercept[IllegalArgumentException] {
      lake.readAsOf(t0.minusSeconds(60))
    }
    assert(early.getMessage.contains("predates"))
    // exactly at v0, and in the gap before v1 (commit instants are
    // microsecond-resolution; at-or-after t0 but before t1 resolves v0)
    assert(lake.readAsOf(t0).count() === 25)
    if (t1.isAfter(t0)) {
      assert(lake.versionAsOf(t1.minusNanos(1000)) === 0L)
    }
    // at v1 and any time after: the latest snapshot
    assert(lake.readAsOf(t1).count() === 5)
    assert(lake.readAsOf(t1.plusSeconds(3600)).count() === 5)
    // the string overload parses ISO-8601
    assert(lake.readAsOf(t1.plusSeconds(3600).toString).count() === 5)
  }

  test("TIMESTAMP AS OF resolves through non-data commits (vacuum) to a data version") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.region); lake.write(t.region)
    lake.vacuum(keepLast = 1) // appends a commit with NO dataVersion
    // "now" is after the vacuum commit; it must resolve to v1, not fail
    assert(lake.readAsOf(java.time.Instant.now().plusSeconds(60)).count() === 5)
  }

  test("restore makes an old snapshot current as a NEW version; later versions survive") {
    val t = Tables(spark, sf0001)
    val lake = VersionedLakeTable(spark, tmp())
    lake.write(t.nation)                                  // v0: 25
    lake.write(t.nation.where(col("n_regionkey") === 0))  // v1: 5
    lake.restore(0)                                       // v2 := v0 content
    assert(lake.latestVersion === 2L)
    assert(lake.read.count() === 25)
    assert(lake.readVersion(1).count() === 5, "restore must not erase intermediate versions")
    val ops = lake.history.select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "RESTORE") === 1)
    // restoring the restore (undo the undo) works the same way
    lake.restore(1)
    assert(lake.read.count() === 5)
  }

  test("delete/update produce new snapshots; old versions stay readable; SQL routes by layout") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = VersionedLakeTable(spark, path)
    lake.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "v", "x"))

    lake.delete(col("x") > 25.0) // v1
    assert(lake.read.count() === 2)
    assert(lake.readVersion(0).count() === 3, "pre-delete snapshot must survive")

    lake.update(Map("v" -> concat(col("v"), lit("!"))), col("id") === 1L) // v2
    assert(lake.read.where(col("id") === 1L).collect().head.getString(1) === "a!")
    assert(lake.readVersion(1).where(col("id") === 1L)
      .collect().head.getString(1) === "a", "pre-update snapshot must survive")

    // the SAME SQL statements route to the versioned layout
    assert(VersionedLakeTable.isVersioned(spark, path))
    spark.sql(s"DELETE FROM graft_lake('$path') WHERE id = 2")
    assert(lake.latestVersion === 3L)
    assert(lake.read.count() === 1)
    spark.sql(s"UPDATE graft_lake('$path') SET x = x + 1 WHERE id = 1")
    assert(lake.read.collect().head.getDouble(2) === 11.0)
    assert(lake.readVersion(2).count() === 2, "SQL DML must not rewrite history")
    val hist = lake.history.select("operation").collect().map(_.getString(0))
    assert(hist.count(_ == "DELETE") === 2 && hist.count(_ == "UPDATE") === 2, hist.toSeq)

    // MERGE on a versioned layout is rejected loudly, table untouched
    Seq((1L, "z", 0.0)).toDF("id", "v", "x").createOrReplaceTempView("vmerge_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO graft_lake('$path') t USING vmerge_src s ON t.id = s.id
                   |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.contains("versioned snapshot layout"), e.getMessage)
    assert(lake.latestVersion === 4L)
  }

  test("readVersion on a missing version fails with a clear error") {
    val lake = VersionedLakeTable(spark, tmp())
    val e = intercept[IllegalArgumentException](lake.readVersion(7))
    assert(e.getMessage.contains("version 7"))
  }
}
