package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec

/** Generated columns (Delta GENERATED ALWAYS AS): computed when absent,
  * validated when provided, recomputed by UPDATE/MERGE, backfilled when
  * declared on a table that already holds rows.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (String, LakeTable) = {
    val root = Files.createTempDirectory("graft_gen").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    (root, lake)
  }

  test("declaring on a table with rows backfills; appends compute when absent") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    // existing rows backfilled through the staged rewrite
    assert(lake.read.orderBy("id").select("x2").as[Double].collect().toSeq ===
      Seq(20.0, 40.0))
    // an append WITHOUT the column computes it
    lake.write(Seq((3L, 30.0)).toDF("id", "x"), SaveMode.Append)
    assert(lake.read.where(col("id") === 3L).select("x2").head.getDouble(0) === 60.0)
    // history records the declaration
    assert(lake.history.where(col("operation") === "ADD GENERATED COLUMN").count() === 1)
  }

  test("a provided generated value must match its expression") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    // correct provided values pass
    lake.write(Seq((4L, 40.0, 80.0)).toDF("id", "x", "x2"), SaveMode.Append)
    // a divergent value is rejected in the constraint pass
    val e = intercept[IllegalArgumentException] {
      lake.write(Seq((5L, 50.0, 999.0)).toDF("id", "x", "x2"), SaveMode.Append)
    }
    assert(e.getMessage.contains("generated_x2"))
    assert(lake.read.count() === 3) // nothing landed
  }

  test("UPDATE recomputes dependencies and refuses direct SET") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    lake.update(Map("x" -> lit(100.0)), col("id") === 1L)
    assert(lake.read.where(col("id") === 1L).select("x2").head.getDouble(0) === 200.0)
    val e = intercept[IllegalArgumentException] {
      lake.update(Map("x2" -> lit(7.0)), col("id") === 1L)
    }
    assert(e.getMessage.contains("generated"))
  }

  test("MERGE recomputes on update and insert; SET on generated refuses") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    val source = Seq((1L, 11.0, 0.0), (9L, 90.0, 0.0)).toDF("id", "x", "x2")
    lake.merge(source, Seq("id"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("x" -> col("s.x")), None)))
    val out = lake.read.orderBy("id").select("id", "x", "x2")
      .as[(Long, Double, Double)].collect().toSeq
    // matched row recomputed; inserted row's bogus provided x2 replaced
    assert(out === Seq((1L, 11.0, 22.0), (2L, 20.0, 40.0), (9L, 90.0, 180.0)))
    intercept[IllegalArgumentException] {
      lake.merge(source, Seq("id"),
        whenMatched = Seq(MergeClause.UpdateWhen(Map("x2" -> lit(1.0)), None)),
        insertUnmatched = false)
    }
  }

  test("upsert computes, validates and recomputes like write and merge") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    // a source batch LACKING the generated column computes it
    lake.upsert(Seq((1L, 50.0), (7L, 70.0)).toDF("id", "x"), Seq("id"))
    val after = lake.read.orderBy("id").select("id", "x2")
      .as[(Long, Double)].collect().toMap
    assert(after(1L) === 100.0 && after(7L) === 140.0 && after(2L) === 40.0)
    // a divergent provided value is rejected
    val e = intercept[IllegalArgumentException] {
      lake.upsert(Seq((8L, 80.0, 5.0)).toDF("id", "x", "x2"), Seq("id"))
    }
    assert(e.getMessage.contains("generated_x2"))
    // the change-feed route (via merge) recomputes instead of SET-ing
    lake.upsert(Seq((1L, 60.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    assert(lake.read.where(col("id") === 1L).select("x2").head.getDouble(0) === 120.0)
  }

  test("clones carry the generated declarations") {
    val (root, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    val shallow = lake.cloneTo(s"$root/cs")
    assert(shallow.generatedColumns === Map("x2" -> "x * 2"))
    shallow.write(Seq((9L, 90.0)).toDF("id", "x"), SaveMode.Append)
    assert(shallow.read.where(col("id") === 9L).select("x2").head.getDouble(0) === 180.0)
    val deep = lake.cloneTo(s"$root/cd", shallow = false)
    assert(deep.generatedColumns === Map("x2" -> "x * 2"))
    intercept[IllegalArgumentException] {
      deep.write(Seq((9L, 90.0, 1.0)).toDF("id", "x", "x2"), SaveMode.Append)
    }
  }

  test("declarations reject unknown references, chains and duplicates") {
    val (_, lake) = fresh()
    lake.addGeneratedColumn("x2", DoubleType, "x * 2")
    intercept[Exception] {
      lake.addGeneratedColumn("bad", DoubleType, "nope + 1")
    }
    val chain = intercept[IllegalArgumentException] {
      lake.addGeneratedColumn("x4", DoubleType, "x2 * 2")
    }
    assert(chain.getMessage.contains("may not reference generated"))
    intercept[IllegalArgumentException] {
      lake.addGeneratedColumn("x2", DoubleType, "x * 3")
    }
  }

  test("SQL: ADD GENERATED COLUMN and ANALYZE TABLE route to the lake") {
    val root = Files.createTempDirectory("graft_gen_sql").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "x"))
    spark.sql(
      s"ALTER TABLE graft_lake('$root/t') ADD GENERATED COLUMN x2 DOUBLE AS (x * 2)")
    assert(lake.generatedColumns === Map("x2" -> "x * 2"))
    assert(lake.read.orderBy("id").select("x2").as[Double].collect().toSeq ===
      Seq(20.0, 40.0, 60.0))
    // ANALYZE = collectStats; the stats then serve readWhere pruning
    spark.sql(
      s"ANALYZE TABLE graft_lake('$root/t') COMPUTE STATISTICS FOR COLUMNS id, x")
    assert(lake.prunedFiles(col("id") === 1L).nonEmpty)
    assert(lake.readWhere(col("id") === 2L).count() === 1)
    // column-less form = incremental refresh (no new files -> no-op)
    spark.sql(s"ANALYZE TABLE graft_lake('$root/t') COMPUTE STATISTICS")
  }
}
