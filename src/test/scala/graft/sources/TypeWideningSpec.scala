package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Numeric type widening (Delta 3.x/4.x parity): `mergeSchema` appends
  * and `schemaEvolution` merges accept a column arriving WIDER along the
  * lossless lattice (byte→short→int→long, float→double, int→double,
  * decimal precision growth, integral→decimal) — the stored schema
  * widens, files written before the change read through the parquet
  * reader's native type promotion, and the batch needs no rewrite of
  * history. Narrower incoming values up-cast silently (value-safe);
  * lossy changes stay schema errors with or without the flag.
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) =
    Files.createTempDirectory(s"graft_widen_$name").toString + "/t"

  test("a concurrent ALTER COLUMN TYPE is never un-widened by an in-flight append's schema save") {
    // the writer aligned its batch against the PRE-widening schema; the
    // DDL lands while the append is staged (before the writer's own
    // saveSchema). Last-writer-wins would save int back over long —
    // leaving the stored schema narrower than the DDL's contract and,
    // after any wide row lands, narrower than on-disk data. saveSchema's
    // monotone merge must keep the wider type.
    val dir = fresh("race")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, 10)).toDF("id", "n").coalesce(1)) // n: int
    var fired = 0
    lake.onStagePreMarkForTest = () => {
      if (fired == 0) {
        fired += 1
        LakeTable(spark, dir).alterColumnType("n", LongType): Unit
      }
    }
    try lake.write(Seq((2, 20)).toDF("id", "n").coalesce(1), SaveMode.Append)
    finally lake.onStagePreMarkForTest = () => ()
    assert(fired == 1, "interleaved DDL never ran")
    val fresh2 = LakeTable(spark, dir)
    assert(fresh2.read.schema("n").dataType === LongType,
      s"widening was undone: ${fresh2.read.schema("n").dataType}")
    // wide rows land and read alongside the narrow-era files
    fresh2.write(Seq((3L, 3000000000L)).toDF("id", "n")
      .withColumn("id", col("id").cast("int")).coalesce(1), SaveMode.Append): Unit
    assert(fresh2.read.where(col("n") === 3000000000L).count() === 1L)
    assert(fresh2.read.count() === 3L)
  }

  test("int->long append: rejected without mergeSchema, widens with it, old files read back") {
    val dir = fresh("intlong")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1))
    assert(lake.read.schema("k").dataType === IntegerType)

    val wide = Seq((5000000000L, "c")).toDF("k", "v").coalesce(1)
    val e = intercept[IllegalArgumentException] {
      lake.write(wide, SaveMode.Append)
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)

    lake.write(wide, SaveMode.Append, mergeSchema = true)
    assert(lake.read.schema("k").dataType === LongType)
    // the pre-widening file (physical int32) reads through the widened
    // schema — content exact, including the value only LONG can hold
    assert(lake.read.as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (5000000000L, "c")))
    // and stays widened for a later narrow append (silent up-cast)
    lake.write(Seq((7, "d")).toDF("k", "v").coalesce(1), SaveMode.Append)
    assert(lake.read.schema("k").dataType === LongType)
    assert(lake.read.where(col("k") === 7L).count() === 1L)
  }

  test("float->double and int->double widen; lossy long->int / long->double stay errors") {
    val dir = fresh("fd")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, 1.5f)).toDF("k", "x").coalesce(1))
    lake.write(Seq((2, 2.25), (3, 1e300)).toDF("k", "x").coalesce(1),
      SaveMode.Append, mergeSchema = true)
    assert(lake.read.schema("x").dataType === DoubleType)
    assert(lake.read.schema("k").dataType === IntegerType) // untouched
    assert(lake.read.select(sum("x")).head().getDouble(0) === 1e300 + 3.75)

    // long->double loses precision past 2^53: NOT widening, even flagged
    val longTable = LakeTable(spark, fresh("longd"))
    longTable.write(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val e1 = intercept[IllegalArgumentException] {
      longTable.write(Seq((1.5, "b")).toDF("k", "v").coalesce(1),
        SaveMode.Append, mergeSchema = true)
    }
    assert(e1.getMessage.contains("type drift"), e1.getMessage)
    // narrowing never evolves: a long table accepts int VALUES (up-cast)
    longTable.write(Seq((9, "c")).toDF("k", "v").coalesce(1), SaveMode.Append)
    assert(longTable.read.schema("k").dataType === LongType)
    assert(longTable.read.count() === 2L)
  }

  test("decimal precision growth widens; scale shrink and digit shrink are errors") {
    val dir = fresh("dec")
    val lake = LakeTable(spark, dir)
    val d52 = Seq("1.50", "2.25").toDF("s")
      .select(col("s").cast(DecimalType(5, 2)).as("d")).coalesce(1)
    lake.write(d52)
    val d124 = Seq("12345678.1234").toDF("s")
      .select(col("s").cast(DecimalType(12, 4)).as("d")).coalesce(1)
    lake.write(d124, SaveMode.Append, mergeSchema = true)
    assert(lake.read.schema("d").dataType === DecimalType(12, 4))
    assert(lake.read.select(sum("d").cast("string")).head().getString(0)
      === "12345681.8734")
    // decimal(12,4) -> decimal(13,6): integer digits shrink 8->7 — lossy
    val e = intercept[IllegalArgumentException] {
      lake.write(Seq("1.5").toDF("s")
        .select(col("s").cast(DecimalType(13, 6)).as("d")).coalesce(1),
        SaveMode.Append, mergeSchema = true)
    }
    assert(e.getMessage.contains("type drift"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens a shared column (int->long)") {
    val dir = fresh("merge")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, 10), (2, 20)).toDF("k", "qty").coalesce(1))
    // source qty is LONG with a value int cannot hold
    lake.merge(Seq((2, 9000000000L), (3, 30L)).toDF("k", "qty"), Seq("k"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("qty" -> col("s.qty")))),
      insertUnmatched = true, schemaEvolution = true)
    assert(lake.read.schema("qty").dataType === LongType)
    assert(lake.read.as[(Int, Long)].collect().sorted.toSeq ===
      Seq((1, 10L), (2, 9000000000L), (3, 30L)))
    // upsert path shares evolveTarget
    lake.upsert(Seq((4, 40L)).toDF("k", "qty"), Seq("k"), schemaEvolution = true)
    assert(lake.read.count() === 4L)
  }

  test("ALTER COLUMN TYPE: metadata-only explicit widening, API and SQL") {
    val dir = fresh("alter")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x").coalesce(1))
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    lake.alterColumnType("k", LongType)
    spark.sql(s"ALTER TABLE graft_lake('$dir') ALTER COLUMN x TYPE DOUBLE")
    // metadata-only: not one data file touched
    val filesAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(filesAfter === filesBefore, "ALTER COLUMN TYPE rewrote data files")
    assert(lake.read.schema("k").dataType === LongType)
    assert(lake.read.schema("x").dataType === DoubleType)
    assert(lake.read.as[(Long, Double)].collect().sorted.toSeq ===
      Seq((1L, 1.5), (2L, 2.5)))
    // widened table accepts long appends without mergeSchema now
    lake.write(Seq((5000000000L, 9.9)).toDF("k", "x").coalesce(1), SaveMode.Append)
    assert(lake.read.count() === 3L)
    // narrowing / lossy rejected with the lattice named
    val e = intercept[IllegalArgumentException] {
      lake.alterColumnType("k", IntegerType)
    }
    assert(e.getMessage.contains("lossless widening"), e.getMessage)
    // history records the DDL
    assert(lake.history.where(col("operation") === "ALTER COLUMN TYPE").count() === 2L)
  }

  test("stats skipping stays sound across a widening (narrow-era stats rows)") {
    val dir = fresh("stats")
    val lake = LakeTable(spark, dir)
    lake.write((1 to 400).map(i => (i, s"v$i")).toDF("k", "v").repartition(4))
    lake.optimize(Seq("k"), numFiles = Some(4))
    lake.collectStats(Seq("k")) // min/max recorded as INT
    lake.write(Seq((6000000000L, "big")).toDF("k", "v").coalesce(1),
      SaveMode.Append, mergeSchema = true) // schema widens; new file unstatted
    // narrow-era stats prune against a LONG predicate — conservative,
    // never wrong: the unstatted wide file always survives
    val hit = lake.readWhere(col("k") === 6000000000L)
    assert(hit.count() === 1L)
    assert(lake.readWhere(col("k") >= 1L && col("k") <= 50L).count() === 50L)
    // refreshStats unions long min/max with the int-era rows (coerced)
    lake.refreshStats()
    assert(lake.readWhere(col("k") === 6000000000L).count() === 1L)
    assert(lake.readWhere(col("k") === 7L).count() === 1L)
  }

  test("change feed reads span a widening (narrow-era change sets promote)") {
    val dir = fresh("cdc")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1))
    lake.upsert(Seq((2, "B2")).toDF("k", "v"), Seq("k"), changeFeed = true)
    lake.write(Seq((5000000000L, "w")).toDF("k", "v").coalesce(1),
      SaveMode.Append, mergeSchema = true)
    lake.upsert(Seq((5000000000L, "W2")).toDF("k", "v"), Seq("k"), changeFeed = true)
    // one read across BOTH eras: int-era change files promote to long
    val changes = lake.readChanges(0L)
    assert(changes.schema("k").dataType === LongType,
      s"change feed did not read through the widened schema: ${changes.schema}")
    val types = changes.select("k", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(types.contains((2L, "update_postimage")) ||
      types.contains((2L, "insert")), s"narrow-era change rows lost: $types")
    assert(types.exists(_._1 == 5000000000L), s"wide-era change rows lost: $types")
  }

  test("partitioned append widens through the same gate") {
    val dir = fresh("part")
    val lake = LakeTable(spark, dir)
    lake.writePartitioned(Seq((1, "a", "p1"), (2, "b", "p2"))
      .toDF("k", "v", "p").coalesce(1), Seq("p"))
    lake.writePartitioned(Seq((5000000000L, "c", "p1"))
      .toDF("k", "v", "p").coalesce(1), Seq("p"),
      SaveMode.Append, mergeSchema = true)
    assert(lake.read.schema("k").dataType === LongType)
    assert(lake.read.where(col("p") === "p1").count() === 2L)
    assert(lake.read.select(sum("k")).head().getLong(0) === 5000000003L)
  }
}
