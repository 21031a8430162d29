package graft.sources

import org.apache.spark.sql.{AnalysisException, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakeNamesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_named").resolve("t").toString

  private def seed(path: String): LakeTable =
    LakeTable(spark, path).write(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("id", "name", "v"), SaveMode.Overwrite)

  test("register + read by name, DML routed by name matches path-form state") {
    val path = tmp(); seed(path)
    LakeNames.register(spark, "named_db", "t1", path)
    assert(spark.sql("SELECT * FROM named_db.t1").count() === 4)

    spark.sql("DELETE FROM named_db.t1 WHERE v > 35.0")
    spark.sql("UPDATE named_db.t1 SET v = v * 10 WHERE id = 1")
    Seq((2L, "B", 999.0), (9L, "i", 90.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("named_src")
    spark.sql(
      """MERGE INTO named_db.t1 t USING named_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val byName = spark.sql("SELECT id, v FROM named_db.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(byName === Seq((1L, 100.0), (2L, 999.0), (3L, 30.0), (9L, 90.0)))
    // same rows through the path API — the name is pure indirection
    val byPath = LakeTable(spark, path).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(byPath === byName)
  }

  test("INSERT INTO by name; history/detail/changes TVFs accept the name") {
    val path = tmp(); seed(path)
    LakeNames.register(spark, "named_db", "t2", path)
    spark.sql("INSERT INTO named_db.t2 VALUES (5, 'e', 50.0)")
    assert(spark.sql("SELECT * FROM named_db.t2").count() === 5)
    assert(spark.sql("SELECT * FROM graft_history('named_db.t2')")
      .where(col("operation") === "WRITE APPEND").count() === 1)
    assert(spark.sql("SELECT * FROM graft_detail('named_db.t2')").count() === 1)
    spark.sql("DELETE FROM graft_lake('" + path + "') WHERE id = 5") // path still works
    assert(spark.sql("SELECT * FROM named_db.t2").count() === 4)
  }

  test("ALTER TABLE ADD COLUMNS by name: the view tracks the evolved schema") {
    val path = tmp(); seed(path)
    LakeNames.register(spark, "named_db", "t3", path)
    spark.sql("ALTER TABLE named_db.t3 ADD COLUMNS (score DOUBLE)")
    spark.sql("INSERT INTO named_db.t3 (id, name, v, score) VALUES (5, 'e', 50.0, 1.5)")
    val rows = spark.sql(
      "SELECT id, score FROM named_db.t3 WHERE score IS NOT NULL").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((5L, 1.5)))
    // pre-evolution rows read the added column as null, by name
    assert(spark.sql("SELECT * FROM named_db.t3 WHERE score IS NULL").count() === 4)
  }

  test("versioned layout by name: latest read, time travel, OPTIMIZE/RESTORE") {
    val path = tmp()
    val vt = VersionedLakeTable(spark, path)
    vt.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"))
    vt.delete(col("id") === 2L)
    LakeNames.register(spark, "named_db", "vt1", path)
    assert(spark.sql("SELECT * FROM named_db.vt1").count() === 2)
    assert(spark.sql("SELECT * FROM graft_lake('named_db.vt1', 0)").count() === 3)
    spark.sql("RESTORE named_db.vt1 TO VERSION AS OF 0")
    assert(spark.sql("SELECT * FROM named_db.vt1").count() === 3)
    spark.sql("DELETE FROM named_db.vt1 WHERE id = 1")
    assert(spark.sql("SELECT id FROM named_db.vt1").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("non-lake names fall through to native Spark errors, state untouched") {
    val path = tmp(); seed(path)
    // a plain parquet catalog table (no lake property) keeps native behavior
    Catalog.createDatabase(spark, "named_db")
    Catalog.registerTable(spark, "named_db", "plain_t", path)
    val e1 = intercept[AnalysisException] {
      spark.sql("DELETE FROM named_db.plain_t WHERE v > 0")
    }
    assert(e1.getMessage.toLowerCase.contains("delete"))
    assert(spark.table("named_db.plain_t").count() === 4) // untouched
    // a name that does not exist surfaces Spark's native resolution error
    val e2 = intercept[AnalysisException] {
      spark.sql("DELETE FROM named_db.no_such_table WHERE v > 0")
    }
    assert(e2.getMessage.contains("no_such_table"))
  }

  test("CREATE TABLE … USING graft_lake LOCATION registers the name in SQL") {
    val path = tmp(); seed(path)
    spark.sql("CREATE DATABASE IF NOT EXISTS named_db")
    spark.sql(s"CREATE TABLE named_db.ct1 USING graft_lake LOCATION '$path'")
    assert(spark.sql("SELECT * FROM named_db.ct1").count() === 4)
    spark.sql("DELETE FROM named_db.ct1 WHERE id = 4")
    assert(spark.sql("SELECT * FROM named_db.ct1").count() === 3)
    // duplicate without a flag errors; IF NOT EXISTS is a no-op
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE named_db.ct1 USING graft_lake LOCATION '$path'")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    val p2 = tmp()
    LakeTable(spark, p2).write(Seq((100L, "z", 1.0)).toDF("id", "name", "v"))
    spark.sql(s"CREATE TABLE IF NOT EXISTS named_db.ct1 USING graft_lake LOCATION '$p2'")
    assert(spark.sql("SELECT * FROM named_db.ct1").count() === 3) // still path 1
    // OR REPLACE repoints
    spark.sql(s"CREATE OR REPLACE TABLE named_db.ct1 USING graft_lake LOCATION '$p2'")
    assert(spark.sql("SELECT * FROM named_db.ct1").count() === 1)
    assert(LakeNames.resolve(spark, Seq("named_db", "ct1")) === Some(p2))
  }

  test("schema-first CREATE TABLE (column list) creates an empty lake table, DML-ready") {
    spark.sql("CREATE DATABASE IF NOT EXISTS named_db")
    val loc = tmp()
    spark.sql(s"CREATE TABLE named_db.sf1 (id BIGINT, name STRING, v DOUBLE) " +
      s"USING graft_lake LOCATION '$loc'")
    assert(spark.sql("SELECT * FROM named_db.sf1").count() === 0)
    assert(spark.table("named_db.sf1").schema.fieldNames.toSeq ===
      Seq("id", "name", "v"))
    // the empty table is a full lake table: DML works immediately
    spark.sql("INSERT INTO named_db.sf1 VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    spark.sql("DELETE FROM named_db.sf1 WHERE id = 2")
    assert(spark.sql("SELECT name FROM named_db.sf1").collect()
      .map(_.getString(0)).toSeq === Seq("a"))
    // re-registering over existing data: a MATCHING column list is fine
    // (data kept), a mismatched one errors loudly
    spark.sql("DROP TABLE named_db.sf1")
    spark.sql(s"CREATE TABLE named_db.sf1 (id BIGINT, name STRING, v DOUBLE) " +
      s"USING graft_lake LOCATION '$loc'")
    assert(spark.sql("SELECT * FROM named_db.sf1").count() === 1)
    spark.sql("DROP TABLE named_db.sf1")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE named_db.sf1 (id BIGINT, wrong STRING) " +
        s"USING graft_lake LOCATION '$loc'")
    }
    assert(e.getMessage.contains("do not match"), e.getMessage)
    // a column-list CREATE for another provider still falls through
    val ploc = tmp()
    spark.sql(s"CREATE TABLE named_db.plain_sf (id INT) USING parquet LOCATION '$ploc'")
    assert(spark.table("named_db.plain_sf").count() === 0)
    spark.sql("DROP TABLE named_db.plain_sf")
  }

  test("DROP TABLE on a registered name unregisters it and keeps the data files") {
    val path = tmp(); seed(path)
    spark.sql("CREATE DATABASE IF NOT EXISTS named_db")
    spark.sql(s"CREATE TABLE named_db.dt1 USING graft_lake LOCATION '$path'")
    assert(spark.sql("SELECT * FROM named_db.dt1").count() === 4)
    spark.sql("DROP TABLE named_db.dt1")
    assert(LakeNames.resolve(spark, Seq("named_db", "dt1")).isEmpty)
    // external-table semantics: the data files survive the drop
    assert(LakeTable(spark, path).read.count() === 4)
    // the name is reusable and IF EXISTS works (idempotent re-drop)
    spark.sql(s"CREATE TABLE named_db.dt1 USING graft_lake LOCATION '$path'")
    spark.sql("DROP TABLE IF EXISTS named_db.dt1")
    spark.sql("DROP TABLE IF EXISTS named_db.dt1") // falls through to Spark: no-op
    assert(LakeNames.resolve(spark, Seq("named_db", "dt1")).isEmpty)
    // a non-lake table keeps Spark's native DROP TABLE behavior
    Catalog.createDatabase(spark, "named_db")
    Catalog.registerTable(spark, "named_db", "drop_plain", path)
    spark.sql("DROP TABLE named_db.drop_plain")
    assert(!spark.catalog.tableExists("named_db.drop_plain"))
  }

  test("CTAS: CREATE TABLE … USING graft_lake LOCATION … AS SELECT writes and registers") {
    val path = tmp(); seed(path)
    LakeNames.register(spark, "named_db", "ctas_src", path)
    val dest = tmp()
    spark.sql(
      s"""CREATE TABLE named_db.ctas1 USING graft_lake LOCATION '$dest'
         |AS SELECT id, v * 2 AS v2 FROM named_db.ctas_src WHERE id <= 3""".stripMargin)
    val got = spark.sql("SELECT * FROM named_db.ctas1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 20.0), (2L, 40.0), (3L, 60.0)))
    // the new table is a full lake table: DML and history work on it
    spark.sql("DELETE FROM named_db.ctas1 WHERE id = 3")
    assert(spark.sql("SELECT * FROM named_db.ctas1").count() === 2)
    assert(LakeTable(spark, dest).history.count() >= 2)
    // plain CREATE refuses a location that already holds a table
    val e = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE named_db.ctas2 USING graft_lake LOCATION '$dest'
           |AS SELECT 1 AS one""".stripMargin)
    }
    assert(e.getMessage.contains("already holds data"), e.getMessage)
    // OR REPLACE rewrites data AND schema
    spark.sql(
      s"""CREATE OR REPLACE TABLE named_db.ctas1 USING graft_lake LOCATION '$dest'
         |AS SELECT 'x' AS tag""".stripMargin)
    assert(spark.sql("SELECT tag FROM named_db.ctas1").collect().map(_.getString(0)).toSeq
      === Seq("x"))
    // PARTITIONED BY lays out partition dirs and stays readable by name
    val pdest = tmp()
    spark.sql(
      s"""CREATE TABLE named_db.ctas_part USING graft_lake PARTITIONED BY (name)
         |LOCATION '$pdest' AS SELECT * FROM named_db.ctas_src""".stripMargin)
    assert(spark.sql("SELECT * FROM named_db.ctas_part").count() === 4)
    assert(new java.io.File(pdest).list().exists(_.startsWith("name=")))
    // a partition-pruning filter by name reaches the scan
    val plan = spark.sql("SELECT id FROM named_db.ctas_part WHERE name = 'a'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("name="), plan)
  }

  test("VERSION AS OF / TIMESTAMP AS OF on a registered name (Delta's native spelling)") {
    val path = tmp()
    val lake = VersionedLakeTable(spark, path)
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    lake.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    LakeNames.register(spark, "named_db", "tt1", path)
    assert(spark.sql("SELECT * FROM named_db.tt1").count() === 3)
    assert(spark.sql("SELECT * FROM named_db.tt1 VERSION AS OF 0").count() === 2)
    // alias + projection + filter still compose around the travel clause
    val got = spark.sql(
      "SELECT t.name FROM named_db.tt1 VERSION AS OF 1 t WHERE t.id = 3")
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("c"))
    // TIMESTAMP AS OF: a timestamp after the first commit but before the
    // second reads version 0 (history stamps are strict ISO instants)
    val stamps = lake.history
      .where(col("operationParameters.dataVersion").isNotNull)
      .select("timestamp").collect().map(r => java.time.Instant.parse(r.getString(0)))
      .sorted
    val between = stamps.head.plusMillis(
      math.max(1, java.time.Duration.between(stamps.head, stamps.last).toMillis / 2))
    assert(spark.sql(
      s"SELECT * FROM named_db.tt1 TIMESTAMP AS OF '$between'").count() === 2)
    // a non-string timestamp expression resolves through the session cast
    assert(spark.sql(
      "SELECT * FROM named_db.tt1 TIMESTAMP AS OF current_timestamp()").count() === 3)
    // subquery position works too
    assert(spark.sql(
      "SELECT count(*) AS n FROM (SELECT * FROM named_db.tt1 VERSION AS OF 0)")
      .collect().head.getLong(0) === 2)
    // unregistered relations keep Spark's native time-travel error
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("tt_native")
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM tt_native VERSION AS OF 0").collect()
    }
  }

  test("q_lake_time_travel is run-count invariant (re-runs append cycles, result fixed)") {
    val sf = "/root/testdata/sf0.001"
    def run() = SourceQueries.lakeTimeTravel(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val first = run()
    assert(first.map(_._1) === Seq("cur", "v0", "v1"))
    assert(run() === first)
  }

  test("CREATE statements with other providers or shapes fall through to Spark") {
    // a column-list parquet CREATE stays native (would fail loudly if the
    // injected parser hijacked it)
    spark.sql("CREATE DATABASE IF NOT EXISTS named_db")
    spark.sql("DROP TABLE IF EXISTS named_db.native_ct")
    spark.sql("CREATE TABLE named_db.native_ct (x INT) USING parquet")
    spark.sql("INSERT INTO named_db.native_ct VALUES (7)")
    assert(spark.table("named_db.native_ct").count() === 1)
    spark.sql("DROP TABLE named_db.native_ct")
    // views and temp views stay native too
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW native_tv AS SELECT 1 AS one")
    assert(spark.table("native_tv").count() === 1)
  }

  test("re-register repoints the name; unregister drops it") {
    val p1 = tmp(); seed(p1)
    val p2 = tmp()
    LakeTable(spark, p2).write(Seq((100L, "z", 1.0)).toDF("id", "name", "v"))
    LakeNames.register(spark, "named_db", "t4", p1)
    assert(spark.sql("SELECT * FROM named_db.t4").count() === 4)
    LakeNames.register(spark, "named_db", "t4", p2)
    assert(spark.sql("SELECT * FROM named_db.t4").count() === 1)
    assert(LakeNames.resolve(spark, Seq("named_db", "t4")) === Some(p2))
    LakeNames.unregister(spark, "named_db", "t4")
    assert(LakeNames.resolve(spark, Seq("named_db", "t4")) === None)
  }
}
