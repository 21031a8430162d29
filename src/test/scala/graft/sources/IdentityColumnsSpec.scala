package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Identity columns (Delta GENERATED ALWAYS AS IDENTITY): engine-assigned
  * BIGINTs — dense per batch, monotone across commits via the commit-log
  * high-water mark, preserved on matched rows by every DML path, never
  * caller-suppliable.
  */
class IdentityColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): LakeTable = {
    val root = Files.createTempDirectory("graft_id").toString
    LakeTable(spark, s"$root/t")
      .write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
  }

  private def ids(lake: LakeTable): Map[Long, Long] =
    lake.read.select("k", "rid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("backfill is dense from start; appends continue from the high-water mark") {
    val lake = fresh()
    lake.addIdentityColumn("rid", start = 100L, step = 10L)
    val after = ids(lake)
    assert(after.values.toSeq.sorted === Seq(100L, 110L, 120L))
    lake.write(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), SaveMode.Append)
    val appended = ids(lake)
    // original rows untouched, new rows take the next dense block
    assert(appended.filterKeys(_ <= 3L).toMap === after)
    assert(appended.values.toSeq.sorted === Seq(100L, 110L, 120L, 130L, 140L))
  }

  test("upsert preserves matched ids and assigns fresh ones to inserts") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    val before = ids(lake)
    lake.upsert(Seq((2L, "B"), (9L, "new")).toDF("k", "v"), Seq("k"))
    val after = ids(lake)
    assert(after(2L) === before(2L), "updated row must keep its identity")
    assert(after(1L) === before(1L) && after(3L) === before(3L))
    assert(after(9L) === 4L, "insert takes the next value (start 1, 3 backfilled)")
    assert(lake.read.where(col("k") === 2L).select("v").head.getString(0) === "B")
  }

  test("conditional merge: update keeps ids, delete drops, insert assigns") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    val before = ids(lake)
    lake.merge(
      Seq((1L, "A"), (3L, "del"), (7L, "ins")).toDF("k", "v"), Seq("k"),
      whenMatched = Seq(
        MergeClause.DeleteWhen(Some(col("s.v") === "del")),
        MergeClause.UpdateWhen(Map("v" -> col("s.v")))))
    val after = ids(lake)
    assert(!after.contains(3L))
    assert(after(1L) === before(1L) && after(2L) === before(2L))
    assert(after(7L) === 4L)
    assert(after.values.toSeq.distinct.length === after.size, "ids stay unique")
  }

  test("merge change feed records the same insert ids the table holds") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    lake.merge(
      Seq((2L, "B"), (8L, "ins")).toDF("k", "v"), Seq("k"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      changeFeed = true)
    val feedInsert = lake.readChanges(lake.history.agg(max("version")).head.getLong(0))
      .where(col("_change_type") === "insert")
      .select("k", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feedInsert === Map(8L -> ids(lake)(8L)))
  }

  test("GENERATED ALWAYS: callers may not supply, SET, or re-declare") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    intercept[IllegalArgumentException] {
      lake.write(Seq((4L, "d", 99L)).toDF("k", "v", "rid"), SaveMode.Append)
    }
    intercept[IllegalArgumentException] {
      lake.upsert(Seq((4L, "d", 99L)).toDF("k", "v", "rid"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      lake.update(Map("rid" -> lit(99L)), col("k") === 1L)
    }
    intercept[IllegalArgumentException] {
      lake.merge(Seq((1L, "x")).toDF("k", "v"), Seq("k"),
        whenMatched = Seq(MergeClause.UpdateWhen(Map("rid" -> lit(99L)))))
    }
    intercept[IllegalArgumentException] { lake.addIdentityColumn("rid") }
    intercept[IllegalArgumentException] { lake.addIdentityColumn("RID") }
  }

  test("the high-water mark survives an Overwrite (ids never reuse)") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    lake.write(Seq((10L, "x"), (11L, "y")).toDF("k", "v"), SaveMode.Overwrite)
    // 3 backfilled ids consumed (1..3); the overwrite batch continues at 4
    assert(ids(lake).values.toSeq.sorted === Seq(4L, 5L))
  }

  test("SQL ALTER TABLE ADD IDENTITY COLUMN with START WITH / INCREMENT BY") {
    val lake = fresh()
    spark.sql(s"ALTER TABLE graft_lake('${lake.path}') ADD IDENTITY COLUMN rid " +
      "START WITH 50 INCREMENT BY 5")
    assert(lake.identityColumns === Map("rid" -> (50L, 5L)))
    assert(ids(lake).values.toSeq.sorted === Seq(50L, 55L, 60L))
    // defaults: start 1, step 1
    val lake2 = fresh()
    spark.sql(s"ALTER TABLE graft_lake('${lake2.path}') ADD IDENTITY COLUMN rid")
    assert(lake2.identityColumns === Map("rid" -> (1L, 1L)))
  }

  test("SQL INSERT works on an identity table (values engine-assigned)") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    // list-less insert covers only the WRITABLE columns (not rid)
    spark.sql(s"INSERT INTO graft_lake('${lake.path}') VALUES (10, 'x')")
    // explicit list likewise
    spark.sql(s"INSERT INTO graft_lake('${lake.path}') (k, v) VALUES (11, 'y')")
    val after = ids(lake)
    assert(after(10L) === 4L && after(11L) === 5L)
    // naming the identity column is a clear error, not a silent drop
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_lake('${lake.path}') (k, v, rid) VALUES (12, 'z', 9)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
  }

  test("update may SET other columns on an identity table") {
    val lake = fresh()
    lake.addIdentityColumn("rid")
    val before = ids(lake)
    lake.update(Map("v" -> lit("z")), col("k") === 2L)
    assert(ids(lake) === before)
    assert(lake.read.where(col("k") === 2L).select("v").head.getString(0) === "z")
  }
}
