package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class FileStatsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_filestats").resolve("t").toString

  /** readWhere must equal read.where on content for every shape —
    * pruning may only shrink the file list.
    */
  private def assertSame(lake: LakeTable, cond: Column): Unit = {
    val expected = lake.read.where(cond).collect().map(_.toString).sorted
    val actual = lake.readWhere(cond).collect().map(_.toString).sorted
    assert(actual.toSeq === expected.toSeq, s"readWhere diverged on $cond")
  }

  test("clustered + statted table prunes files on point/range/IN/prefix predicates") {
    val li = Tables(spark, sf0001).lineitem
    val lake = LakeTable(spark, tmp()).write(li)
    lake.optimize(Seq("l_partkey"), numFiles = Some(8))
    lake.collectStats(Seq("l_partkey", "l_returnflag"))
    val total = lake.prunedFiles(lit(true)).size
    assert(total === 8)

    val point = col("l_partkey") === 17
    assert(lake.prunedFiles(point).size < total)
    assertSame(lake, point)

    val range = col("l_partkey") > 10 && col("l_partkey") <= 40
    assert(lake.prunedFiles(range).size < total)
    assertSame(lake, range)

    val in = col("l_partkey").isin(3, 5, 7)
    assert(lake.prunedFiles(in).size < total)
    assertSame(lake, in)

    // flipped literal-first comparisons prune too
    assert(lake.prunedFiles(lit(10) > col("l_partkey")).size < total)
    assertSame(lake, lit(10) > col("l_partkey"))

    // OR keeps the union of both sides' candidates; AND intersects
    val or = col("l_partkey") === 1 || col("l_partkey") === 190
    assert(lake.prunedFiles(or).size <= total)
    assertSame(lake, or)

    // un-statted column in an AND still lets the statted side prune
    val mixed = col("l_partkey") === 17 && col("l_quantity") > 0
    assert(lake.prunedFiles(mixed).size < total)
    assertSame(lake, mixed)

    // unsupported shape (endsWith) -> no pruning, same answer
    val unsupported = col("l_returnflag").endsWith("F")
    assert(lake.prunedFiles(unsupported).size === total)
    assertSame(lake, unsupported)

    // string prefix uses the successor bound
    assertSame(lake, col("l_returnflag").startsWith("N"))

    // an impossible predicate prunes everything yet keeps the schema
    val none = col("l_partkey") === -1
    assert(lake.prunedFiles(none).isEmpty)
    assert(lake.readWhere(none).count() === 0)
    assert(lake.readWhere(none).columns === lake.read.columns)
  }

  test("null semantics: IS NULL / IS NOT NULL prune from null counts") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, None))
      .toDF("id", "x").repartitionByRange(2, col("id"))
    val lake = LakeTable(spark, tmp())
    // two files: ids {1,2} (no nulls) and {3,4} (all null)
    lake.write(df.sortWithinPartitions("id"))
    lake.collectStats(Seq("id", "x"))
    val total = lake.prunedFiles(lit(true)).size
    assert(total === 2)
    assert(lake.prunedFiles(col("x").isNull).size === 1)
    assertSame(lake, col("x").isNull)
    assert(lake.prunedFiles(col("x").isNotNull).size === 1)
    assertSame(lake, col("x").isNotNull)
    // value predicate on the all-null file: NULL bounds prune it
    assert(lake.prunedFiles(col("x") === 1.0).size === 1)
    assertSame(lake, col("x") === 1.0)
  }

  test("appended files without stats are never pruned; rewrites drop stale stats") {
    val s = spark
    import s.implicits._
    val lake = LakeTable(spark, tmp())
      .write(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    lake.collectStats(Seq("id"))
    assert(lake.prunedFiles(col("id") === 99L).isEmpty)
    // the appended file holds id=99 but has no stats row -> must be kept
    lake.write(Seq((99L, "z")).toDF("id", "v").coalesce(1), SaveMode.Append)
    val hit = lake.readWhere(col("id") === 99L)
    assert(hit.count() === 1 && hit.head.getString(1) === "z")
    // a rewrite replaces every file; stale stats must not survive it
    lake.optimize(Seq("id"), numFiles = Some(1))
    assert(!new java.io.File(lake.path, LakeTable.StatsDirName).exists())
    assert(lake.readWhere(col("id") === 99L).count() === 1)
  }

  test("stats skip on a Hive-partitioned layout keeps partition columns readable") {
    val o = Tables(spark, sf0001).orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val lake = LakeTable(spark, tmp()).writePartitioned(o, Seq("o_orderstatus"))
    lake.collectStats(Seq("o_orderkey"))
    val cond = col("o_orderkey") <= 100 && col("o_orderstatus") === "O"
    val expected = lake.read.where(cond).count()
    val got = lake.readWhere(cond)
    assert(got.columns.contains("o_orderstatus"))
    assert(got.count() === expected && expected > 0)
  }

  test("prefixSuccessor increments correctly at boundaries") {
    assert(FileStats.prefixSuccessor("abc") === Some("abd"))
    assert(FileStats.prefixSuccessor("ab￿") === Some("ac"))
    assert(FileStats.prefixSuccessor("￿￿") === None)
  }
}
