package graft.plans

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.LakeTable

class LakeSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sqldml").resolve("t").toString

  private def seed(path: String): LakeTable =
    LakeTable(spark, path).write(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("id", "name", "v"), SaveMode.Overwrite)

  test("DELETE FROM graft_lake with WHERE") {
    val path = tmp(); seed(path)
    spark.sql(s"DELETE FROM graft_lake('$path') WHERE v > 25.0")
    assert(LakeTable(spark, path).read.select("id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(LakeTable(spark, path).history
      .where(col("operation") === "DELETE").count() === 1)
  }

  test("DELETE with a target alias and qualified predicate; no WHERE deletes all") {
    val path = tmp(); seed(path)
    spark.sql(s"DELETE FROM graft_lake('$path') AS u WHERE u.name = 'a'")
    assert(LakeTable(spark, path).read.count() === 3)
    spark.sql(s"DELETE FROM graft_lake('$path')")
    assert(LakeTable(spark, path).read.count() === 0)
  }

  test("UPDATE SET evaluates against the pre-update row (multi-assignment)") {
    val path = tmp(); seed(path)
    spark.sql(
      s"UPDATE graft_lake('$path') SET v = v * 2, name = concat(name, '!') WHERE id <= 2")
    val rows = LakeTable(spark, path).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1L, "a!", 20.0), (2L, "b!", 40.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("UPDATE without WHERE touches every row; alias-qualified SET works") {
    val path = tmp(); seed(path)
    spark.sql(s"UPDATE graft_lake('$path') u SET u.v = u.v + 1")
    assert(LakeTable(spark, path).read.agg(sum("v")).collect().head.getDouble(0) === 104.0)
  }

  test("MERGE INTO: update + delete clauses in order, INSERT * with condition") {
    val path = tmp(); seed(path)
    Seq((2L, "B", 200.0, false), (3L, "C", 300.0, true),
      (5L, "e", 50.0, false), (6L, "f", 60.0, true))
      .toDF("id", "name", "v", "drop").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO graft_lake('$path') t
         |USING (SELECT id, name, v, `drop` FROM merge_src) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.`drop` THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v + t.v
         |WHEN NOT MATCHED AND NOT s.`drop` THEN INSERT *
         |""".stripMargin)
    val rows = LakeTable(spark, path).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // 1 untouched, 2 updated (v = 200+20), 3 deleted, 4 untouched, 5 inserted, 6 gated out
    assert(rows.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B", 220.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("MERGE with a plain table-name source and no NOT MATCHED clause") {
    val path = tmp(); seed(path)
    Seq((1L, "z", 0.0), (9L, "q", 9.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("merge_src2")
    spark.sql(
      s"""MERGE INTO graft_lake('$path') t USING merge_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name""".stripMargin)
    val byId = LakeTable(spark, path).read
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === Map(1L -> "z", 2L -> "b", 3L -> "c", 4L -> "d"),
      "unmatched source row 9 must NOT be inserted without a NOT MATCHED clause")
  }

  test("WHEN NOT MATCHED BY SOURCE: target-only update and delete arms") {
    val path = tmp(); seed(path)
    Seq((1L, "A", 100.0), (9L, "q", 9.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("bysource_src")
    spark.sql(
      s"""MERGE INTO graft_lake('$path') t USING bysource_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 30.0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = concat(t.name, '?')
         |""".stripMargin)
    val rows = LakeTable(spark, path).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // 1 matched (renamed A); 2 unmatched-by-source v<30 (marked ?);
    // 3, 4 unmatched-by-source v>=30 (deleted); 9 NOT inserted (no clause)
    assert(rows.toSeq === Seq((1L, "A", 10.0), (2L, "b?", 20.0)))

    // source references inside a BY SOURCE arm are rejected loudly
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft_lake('$path') t USING bysource_src s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("cannot reference the source"), e.getMessage)

    // an UNQUALIFIED source-only column must error too — it would
    // otherwise resolve through the join and evaluate to null on every
    // unmatched-by-source row (silent three-valued no-op)
    Seq((1L, true)).toDF("id", "extra_flag").createOrReplaceTempView("bysource_extra")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft_lake('$path') t USING bysource_extra s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND extra_flag THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("not a column of the target table"), e2.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns; plain MERGE rejects them") {
    val path = tmp(); seed(path)
    Seq((2L, "B", 200.0, 7L), (9L, "Z", 900.0, 9L))
      .toDF("id", "name", "v", "score").createOrReplaceTempView("evo_src")
    // without the clause, drift stays an error
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft_lake('$path') t USING evo_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET score = s.score""".stripMargin)
    }
    assert(e.getMessage.contains("unknown columns"), e.getMessage)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft_lake('$path') t
         |USING evo_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name, score = s.score
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = LakeTable(spark, path).read
    assert(t.schema.fieldNames.toSeq === Seq("id", "name", "v", "score"))
    val got = t.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq === Seq(
      (1L, "a", None), (2L, "B", Some(7L)), (3L, "c", None), (4L, "d", None),
      (9L, "Z", Some(9L))))
  }

  test("DESCRIBE HISTORY / DETAIL statements are TVF sugar; plain DESCRIBE stays native") {
    val path = tmp(); seed(path)
    spark.sql(s"DELETE FROM graft_lake('$path') WHERE id = 4")
    val h = spark.sql(s"DESCRIBE HISTORY graft_lake('$path')")
    val ops = h.select("operation").collect().map(_.getString(0))
    assert(ops.length === 2)
    assert(ops.head === "DELETE", s"history must be latest-first: ${ops.toSeq}")
    assert(spark.sql(s"DESCRIBE HISTORY graft_lake('$path') LIMIT 1").count() === 1)
    val d = spark.sql(s"DESCRIBE DETAIL graft_lake('$path')")
    assert(d.count() === 1)
    // a registered name works as the target too
    graft.sources.LakeNames.register(spark, "named_db", "dh1", path)
    assert(spark.sql("DESCRIBE HISTORY named_db.dh1").count() === 2)
    // plain DESCRIBE of a non-lake relation keeps native behavior
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("desc_tv")
    assert(spark.sql("DESCRIBE desc_tv").count() === 2)
  }

  test("keywords inside string literals don't confuse clause detection") {
    val path = tmp(); seed(path)
    spark.sql(s"UPDATE graft_lake('$path') SET name = 'WHEN MATCHED THEN , WHERE' WHERE id = 1")
    assert(LakeTable(spark, path).read.where(col("id") === 1)
      .collect().head.getString(1) === "WHEN MATCHED THEN , WHERE")
    spark.sql(s"DELETE FROM graft_lake('$path') WHERE name = 'WHEN MATCHED THEN , WHERE'")
    assert(LakeTable(spark, path).read.count() === 3)
  }

  test("INSERT INTO/OVERWRITE: VALUES, SELECT sources, column lists, cast-on-insert") {
    val path = tmp(); seed(path)
    // full-row VALUES: int/decimal literals cast to bigint/double
    spark.sql(s"INSERT INTO graft_lake('$path') VALUES (5, 'e', 50.5), (6, 'f', 60)")
    assert(LakeTable(spark, path).read.count() === 6)
    // column list: unnamed column null-fills; positional mapping
    spark.sql(s"INSERT INTO graft_lake('$path') (id, v) VALUES (7, 70.0)")
    val r7 = LakeTable(spark, path).read.where(col("id") === 7).collect().head
    assert(r7.isNullAt(1) && r7.getDouble(2) === 70.0)
    // SELECT source
    Seq((8L, "h", 80.0)).toDF("id", "name", "v").createOrReplaceTempView("ins_src")
    spark.sql(s"INSERT INTO graft_lake('$path') SELECT * FROM ins_src")
    assert(LakeTable(spark, path).read.count() === 8)
    // missing columns WITHOUT a column list is rejected (arity check)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO graft_lake('$path') SELECT id, name FROM ins_src")
    }
    assert(e.getMessage.contains("cover every table column"), e.getMessage)
    // a typo'd name in the column list errors instead of silently
    // discarding the inserted values and null-filling the real column
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO graft_lake('$path') (id, vv) VALUES (9, 90.0)")
    }
    assert(e2.getMessage.contains("not in the table"), e2.getMessage)
    assert(LakeTable(spark, path).read.where(col("id") === 9).count() === 0)
    // OVERWRITE replaces the content
    spark.sql(s"INSERT OVERWRITE graft_lake('$path') SELECT * FROM ins_src")
    assert(LakeTable(spark, path).read.collect().map(_.getLong(0)).toSeq === Seq(8L))

    // generated column omitted from an explicit list COMPUTES instead of
    // null-filling into its own validation failure (Delta behavior)
    val gpath = tmp()
    LakeTable(spark, gpath).write(Seq((1L, 2.0)).toDF("id", "x"))
      .addGeneratedColumn("x2", org.apache.spark.sql.types.DoubleType, "x * 2")
    spark.sql(s"INSERT INTO graft_lake('$gpath') (id, x) VALUES (2, 5.0)")
    assert(LakeTable(spark, gpath).read.where(col("id") === 2)
      .select("x2").head.getDouble(0) === 10.0)
    // ...while EXPLICITLY provided generated values still validate
    val eg = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO graft_lake('$gpath') (id, x, x2) VALUES (3, 5.0, 11.0)")
    }
    assert(eg.getMessage.contains("generated"), eg.getMessage)

    // versioned layout: INTO unions into a new snapshot, history preserved
    val vpath = tmp()
    val vt = graft.sources.VersionedLakeTable(spark, vpath)
    vt.write(Seq((1L, "a")).toDF("id", "s"))
    spark.sql(s"INSERT INTO graft_lake('$vpath') VALUES (2, 'b')")
    assert(vt.read.count() === 2)
    assert(vt.readVersion(0).count() === 1)
  }

  test("ALTER TABLE: metadata-only ADD COLUMNS, CHECK constraints gate writes via SQL") {
    val path = tmp(); seed(path)
    val filesBefore = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    spark.sql(s"ALTER TABLE graft_lake('$path') ADD COLUMNS (score DOUBLE, tag STRING)")
    val lake = LakeTable(spark, path)
    // existing rows read the new columns as null; NO data files rewritten
    val r = lake.read
    assert(r.columns.toSeq === Seq("id", "name", "v", "score", "tag"))
    assert(r.where(col("score").isNull && col("tag").isNull).count() === 4)
    val filesAfter = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(filesAfter === filesBefore, "ADD COLUMNS must not rewrite data")
    // duplicate name rejected
    intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_lake('$path') ADD COLUMNS (NAME STRING)")
    }

    spark.sql(s"ALTER TABLE graft_lake('$path') ADD CONSTRAINT v_pos CHECK (v > 0)")
    // a violating append is rejected by the SQL-added constraint
    intercept[Exception] {
      lake.write(Seq((9L, "x", -1.0, null.asInstanceOf[java.lang.Double], null.asInstanceOf[String]))
        .toDF("id", "name", "v", "score", "tag"), SaveMode.Append)
    }
    assert(lake.read.count() === 4)
    // adding a constraint the EXISTING data violates is rejected
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_lake('$path') ADD CONSTRAINT v_big CHECK (v > 100)")
    }
    spark.sql(s"ALTER TABLE graft_lake('$path') DROP CONSTRAINT v_pos")
    lake.write(Seq((9L, "x", -1.0, null.asInstanceOf[java.lang.Double], null.asInstanceOf[String]))
      .toDF("id", "name", "v", "score", "tag"), SaveMode.Append)
    assert(lake.read.count() === 5)
  }

  test("RESTORE TO VERSION AS OF rolls a versioned table back, append-only") {
    import graft.sources.VersionedLakeTable
    val path = tmp()
    val t = VersionedLakeTable(spark, path)
    t.write(Seq((1L, "v0")).toDF("id", "s"))
    t.write(Seq((1L, "v1"), (2L, "v1")).toDF("id", "s"))
    spark.sql(s"RESTORE TABLE graft_lake('$path') TO VERSION AS OF 0")
    assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "v0")))
    // append-only history: the pre-restore snapshot is still readable,
    // and the restore itself is restorable
    assert(t.readVersion(1).count() === 2)
    assert(t.history.where(col("operation") === "RESTORE").count() === 1)
    spark.sql(s"RESTORE graft_lake('$path') TO VERSION AS OF 1")
    assert(t.read.count() === 2)
  }

  test("CASE WHEN expressions survive inside MERGE clause conditions and SET") {
    val path = tmp(); seed(path)
    Seq((1L, "A", 100.0), (2L, "B", -5.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("case_src")
    // the CASE's own WHEN/THEN/END keywords must not terminate the
    // condition or assignment slices
    spark.sql(
      s"""MERGE INTO graft_lake('$path') t USING case_src s ON t.id = s.id
         |WHEN MATCHED AND CASE WHEN s.v < 0 THEN true ELSE false END THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = CASE WHEN s.v > 50 THEN s.v ELSE t.v END
         |""".stripMargin)
    val rows = LakeTable(spark, path).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // 2 deleted (s.v<0); 1 updated to 100; 3, 4 untouched
    assert(rows.toSeq === Seq((1L, 100.0), (3L, 30.0), (4L, 40.0)))
  }

  test("OPTIMIZE and VACUUM statements: compaction, zorder clustering, retention") {
    val path = tmp(); seed(path)
    val before = LakeTable(spark, path).read.orderBy("id").collect().map(_.toSeq).toSeq
    spark.sql(s"OPTIMIZE graft_lake('$path')") // plain compaction
    assert(LakeTable(spark, path).read.orderBy("id").collect().map(_.toSeq).toSeq === before)
    spark.sql(s"OPTIMIZE graft_lake('$path') ZORDER BY (id, v)")
    assert(LakeTable(spark, path).read.orderBy("id").collect().map(_.toSeq).toSeq === before)
    spark.sql(s"OPTIMIZE graft_lake('$path') HILBERT BY (id, v)")
    assert(LakeTable(spark, path).read.orderBy("id").collect().map(_.toSeq).toSeq === before)
    val ops = LakeTable(spark, path).history.select("operation")
      .collect().map(_.getString(0))
    assert(ops.exists(_.startsWith("OPTIMIZE ZORDER")), ops.toSeq)
    assert(ops.exists(_.startsWith("OPTIMIZE HILBERT")), ops.toSeq)
    spark.sql(s"VACUUM graft_lake('$path')") // debris GC, content untouched
    assert(LakeTable(spark, path).read.count() === 4)

    // versioned: cluster into a new snapshot, then retention-vacuum
    val vpath = tmp()
    val vt = graft.sources.VersionedLakeTable(spark, vpath)
    vt.write(Seq((2L, "b"), (1L, "a")).toDF("id", "s"))
    vt.write(Seq((2L, "b"), (1L, "a"), (3L, "c")).toDF("id", "s"))
    spark.sql(s"OPTIMIZE graft_lake('$vpath') ZORDER BY (id)")
    assert(vt.latestVersion === 2L)
    spark.sql(s"VACUUM graft_lake('$vpath') RETAIN 1 VERSIONS")
    assert(vt.read.count() === 3)
    intercept[Exception] { vt.readVersion(0) } // vacuumed away
    // guard rails
    intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft_lake('$vpath')")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft_lake('$path') RETAIN 2 VERSIONS")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft_lake('$vpath') HILBERT BY (id)")
    }
  }

  test("VACUUM … CHANGES RETAIN trims the CDC feed via SQL") {
    val path = tmp()
    val lake = seed(path)
    lake.upsert(Seq((1L, "a", 11.0)).toDF("id", "name", "v"), Seq("id"),
      changeFeed = true)
    lake.upsert(Seq((5L, "e", 50.0)).toDF("id", "name", "v"), Seq("id"),
      changeFeed = true)
    spark.sql(s"VACUUM graft_lake('$path') CHANGES RETAIN 1 VERSIONS")
    assert(lake.readChanges().select("_commit_version")
      .distinct().collect().map(_.getLong(0)).toSet === Set(2L))
    assert(lake.history.where(col("operation") === "VACUUM CHANGES").count() === 1)
    // the named-table spelling routes through the same command
    graft.sources.LakeNames.register(spark, "named_db", "cdc_t", path)
    spark.sql("VACUUM named_db.cdc_t CHANGES RETAIN 1 VERSIONS")
    assert(lake.history.where(col("operation") === "VACUUM CHANGES").count() === 2)
    // CHANGES without RETAIN has no defined window — reject
    intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft_lake('$path') CHANGES")
    }
  }

  test("graft_detail reports layout, counts, schema, constraints in one row") {
    val path = tmp(); seed(path)
    spark.sql(s"ALTER TABLE graft_lake('$path') ADD CONSTRAINT v_pos CHECK (v > 0)")
    // access BY NAME: the column contract (incl. ordering) is pinned in
    // TableDetailSpec; this test cares about the values
    val row = spark.sql(s"SELECT * FROM graft_detail('$path')").collect().head
    assert(row.getAs[String]("layout") === "lake")
    assert(row.getAs[Long]("num_files") > 0 && row.getAs[Long]("size_bytes") > 0,
      "file/byte counts empty")
    assert(row.getAs[Long]("num_commits") >= 2, "expected write + constraint commits")
    assert(row.getAs[String]("schema_json").contains("\"name\""),
      "schema json missing columns")
    assert(row.getAs[String]("constraints") === "v_pos CHECK (v > 0)")
    // versioned layout reports its kind
    val vpath = tmp()
    import spark.implicits._
    graft.sources.VersionedLakeTable(spark, vpath)
      .write(Seq((1L, "a")).toDF("id", "s"))
    assert(spark.sql(s"SELECT layout FROM graft_detail('$vpath')")
      .collect().head.getString(0) === "versioned")
  }

  test("DML against non-lake targets falls through to Spark's native handling") {
    seed(tmp()) // unrelated
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("plain_view")
    // a temp view supports none of the row-level commands: Spark itself
    // must produce its native error, proving we did not intercept
    val e = intercept[Exception] { spark.sql("DELETE FROM plain_view WHERE id = 1") }
    assert(!e.getMessage.contains("graft lake DML"), e.getMessage)
    // and plain SELECTs over graft_lake still parse through the delegate path
    val path = tmp(); seed(path)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft_lake('$path')")
      .collect().head.getLong(0) === 4L)
  }

  test("clear errors: column-list INSERT, non-equi ON, trailing garbage") {
    val path = tmp(); seed(path)
    Seq((1L, "x", 1.0)).toDF("id", "name", "v").createOrReplaceTempView("merge_src3")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO graft_lake('$path') t USING merge_src3 s ON t.id = s.id
                   |WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (s.id, s.name, s.v)
                   |""".stripMargin)
    }
    assert(e1.getMessage.contains("INSERT *"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO graft_lake('$path') t USING merge_src3 s ON t.id < s.id
                   |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("equi-key"), e2.getMessage)
    // LIMIT parses into the condition slice and fails expression parsing —
    // the statement is rejected (ParseException), not half-applied
    intercept[Exception] {
      spark.sql(s"DELETE FROM graft_lake('$path') WHERE id = 1 LIMIT 1")
    }
    assert(LakeTable(spark, path).read.count() === 4)
  }
}
