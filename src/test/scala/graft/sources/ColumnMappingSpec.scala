package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metadata-only RENAME/DROP COLUMN via name-mode column mapping: no data
  * file is rewritten, reads bridge physical -> logical, writes bridge back,
  * retired physical names can never be rebound by a same-named new column.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): LakeTable = {
    val root = Files.createTempDirectory("graft_cmap").toString
    LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z"))
        .toDF("k", "amount", "tag"))
  }

  private def dataFiles(lake: LakeTable): Set[String] =
    // inputFiles includes the DV anti-join's own parquet once vectors
    // exist — only the table's data files matter for "metadata-only"
    lake.read.inputFiles.filterNot(_.contains("/_graft_")).toSet

  test("rename is metadata-only: same files, new name, old data") {
    val lake = fresh()
    val before = dataFiles(lake)
    lake.renameColumn("amount", "price")
    assert(dataFiles(lake) === before, "rename must not touch data files")
    assert(lake.read.columns.toSeq === Seq("k", "price", "tag"))
    assert(lake.read.orderBy("k").select("price").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0))
    assert(lake.history.where(col("operation") === "RENAME COLUMN").count() === 1)
  }

  test("writes after a rename land under the physical name and read back") {
    val lake = fresh()
    lake.renameColumn("amount", "price")
    lake.write(Seq((4L, 40.0, "w")).toDF("k", "price", "tag"), SaveMode.Append)
    assert(lake.read.orderBy("k").select("price").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0, 40.0))
    // old and new files agree under a filter too
    assert(lake.read.where(col("price") > 25.0).count() === 2)
  }

  test("drop is metadata-only and a re-added same-name column starts null") {
    val lake = fresh()
    val before = dataFiles(lake)
    lake.dropColumn("amount")
    assert(dataFiles(lake) === before, "drop must not touch data files")
    assert(lake.read.columns.toSeq === Seq("k", "tag"))
    // re-add a column with the SAME name: the retired physical name must
    // not rebind, so old rows read NULL, not the dropped values
    lake.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.DoubleType))))
    assert(lake.read.where(col("amount").isNotNull).count() === 0,
      "retired physical bytes must not resurface under a reused name")
    lake.write(Seq((4L, "w", 99.0)).toDF("k", "tag", "amount"), SaveMode.Append)
    assert(lake.read.where(col("amount").isNotNull).count() === 1)
    assert(lake.read.where(col("k") === 4L).select("amount").head.getDouble(0) === 99.0)
  }

  test("DML keeps working through the mapping") {
    val lake = fresh()
    lake.renameColumn("amount", "price")
    lake.update(Map("price" -> (col("price") * 2)), col("k") === 2L)
    lake.upsert(Seq((3L, 300.0, "Z"), (5L, 50.0, "v")).toDF("k", "price", "tag"), Seq("k"))
    lake.delete(col("k") === 1L)
    val out = lake.read.orderBy("k").select("k", "price").as[(Long, Double)].collect().toSeq
    assert(out === Seq((2L, 40.0), (3L, 300.0), (5L, 50.0)))
  }

  test("deletion vectors apply on a mapped read") {
    val lake = fresh()
    lake.renameColumn("amount", "price")
    val before = dataFiles(lake)
    lake.deleteVectored(col("k") === 2L)
    assert(dataFiles(lake) === before, "merge-on-read delete keeps files")
    assert(lake.read.orderBy("k").select("k").as[Long].collect().toSeq ===
      Seq(1L, 3L))
    assert(lake.readWhere(col("price") > 5.0).count() === 2)
  }

  test("stats rename with the column; dropped stats never mislead") {
    val root = Files.createTempDirectory("graft_cmap_stats").toString
    val lake = LakeTable(spark, s"$root/t")
    // key-disjoint files so the point predicate can actually prune
    lake.write((0L until 300L).map(i => (i, i * 1.0, s"t$i")).toDF("k", "amount", "tag"))
    lake.optimize(Seq("amount"), numFiles = Some(6))
    lake.collectStats(Seq("amount", "k"))
    lake.renameColumn("amount", "price")
    // pruning must WORK against the NEW name (the pushed-down filter
    // speaks the physical name; the stats speak the logical) — not just
    // stay correct
    val pruned = lake.prunedFiles(col("price") === 10.0)
    assert(pruned.length < lake.read.inputFiles.length,
      s"rename must not disable stats pruning (${pruned.length} files)")
    assert(lake.readWhere(col("price") === 10.0).count() === 1)
    val statted = spark.read.parquet(s"${lake.path}/_graft_stats").columns
    assert(statted.exists(_.startsWith("price__graft_")))
    assert(!statted.exists(_.startsWith("amount__graft_")))
    // refreshStats keeps working after an append (spec carries old name —
    // rename committed a fresh COLLECT STATS param set)
    lake.write(Seq((1000L, 5000.0, "q")).toDF("k", "price", "tag"), SaveMode.Append)
    lake.refreshStats()
    assert(lake.readWhere(col("price") === 5000.0).count() === 1)
  }

  test("constraint or generated references block the DDL") {
    val lake = fresh()
    lake.addConstraint("pos", "amount > 0")
    intercept[IllegalArgumentException] { lake.renameColumn("amount", "price") }
    intercept[IllegalArgumentException] { lake.dropColumn("amount") }
    lake.dropConstraint("pos")
    lake.addGeneratedColumn("amount2",
      org.apache.spark.sql.types.DoubleType, "amount * 2")
    intercept[IllegalArgumentException] { lake.dropColumn("amount") }
    // the generated column itself CAN be renamed/dropped
    lake.renameColumn("amount2", "double_amount")
    assert(lake.generatedColumns.keySet === Set("double_amount"))
    lake.dropColumn("double_amount")
    assert(lake.generatedColumns.isEmpty)
  }

  test("a shallow clone carries the mapping; SQL spellings work") {
    val lake = fresh()
    spark.sql(s"ALTER TABLE graft_lake('${lake.path}') RENAME COLUMN amount TO price")
    val dest = Files.createTempDirectory("graft_cmap_clone").toString + "/c"
    val clone = lake.cloneTo(dest, shallow = true)
    assert(clone.read.orderBy("k").select("price").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0))
    spark.sql(s"ALTER TABLE graft_lake('${lake.path}') DROP COLUMN tag")
    assert(lake.read.columns.toSeq === Seq("k", "price"))
    // the clone pinned its own metadata at clone time — tag survives there
    assert(clone.read.columns.toSeq === Seq("k", "price", "tag"))
  }

  test("REORG PURGE pays the mapping debt: files normalize, mapping clears") {
    val lake = fresh()
    lake.renameColumn("amount", "price")
    lake.dropColumn("tag")
    val before = dataFiles(lake)
    spark.sql(s"REORG TABLE graft_lake('${lake.path}') APPLY (PURGE)")
    assert(dataFiles(lake) !== before, "purge must rewrite the files")
    assert(lake.columnMapping === ((Map.empty, Set.empty)))
    // physical names now ARE the logical names: a raw schema-less read
    // sees `price`, and the retired `tag` bytes are gone
    val raw = spark.read.parquet(lake.path)
    assert(raw.columns.toSet === Set("k", "price"))
    assert(lake.read.orderBy("k").select("price").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0))
    // a re-added `tag` needs no fresh physical name anymore
    lake.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType))))
    assert(lake.columnMapping._1.isEmpty)
    assert(lake.history.where(col("operation") === "REORG PURGE").count() === 1)
  }

  test("rename round-trip back to the original name is still readable") {
    val lake = fresh()
    lake.renameColumn("amount", "price")
    lake.write(Seq((4L, 40.0, "w")).toDF("k", "price", "tag"), SaveMode.Append)
    lake.renameColumn("price", "amount")
    assert(lake.read.orderBy("k").select("amount").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0, 40.0))
  }
}
