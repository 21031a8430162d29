package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.SparkSpec

class GeneratedPruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_genprune").resolve("t").toString

  private def mkTable(): (LakeTable, org.apache.spark.sql.DataFrame) = {
    // 40 days of hourly-ish rows
    val df = (0 until 960).map { i =>
      (i.toLong, new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 3600L * 1000), i * 1.5)
    }.toDF("id", "ts", "v")
    val lake = LakeTable(spark, tmp())
    lake.write(df.limit(1)) // schema seed, then declare + re-lay partitioned
    lake.addGeneratedColumn("day", DateType, "to_date(ts)")
    lake.writePartitioned(df, Seq("day"))
    (lake, df)
  }

  test("a ts-range filter derives day bounds and prunes partition dirs") {
    val (lake, df) = mkTable()
    val cond = col("ts") >= "2024-02-01 00:00:00" && col("ts") < "2024-02-03 00:00:00"
    val derived = lake.derivedGeneratedFilters(cond)
    assert(derived.size === 2, s"expected two derived bounds, got $derived")
    val q = lake.readWhere(cond)
    val expected = df.where(cond).count()
    assert(q.count() === expected && expected === 48L)
    q.collect()
    val filesRead = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    val totalDirs = new java.io.File(lake.path).listFiles()
      .count(_.getName.startsWith("day="))
    assert(totalDirs === 40, s"expected 40 day partitions, got $totalDirs")
    // 2 calendar days + the <-bound's inclusive boundary day = at most 3
    assert(filesRead <= 3,
      s"ts filter should prune to <=3 of $totalDirs day dirs, read $filesRead files")
  }

  test("equality, reversed operands, and unrecognized shapes") {
    val (lake, df) = mkTable()
    // equality derives day = to_date(lit)
    val eq = lake.readWhere(col("ts") === "2024-01-05 07:00:00")
    assert(eq.count() === 1L)
    eq.collect()
    val filesEq = eq.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    assert(filesEq <= 1, s"equality should prune to one day dir, read $filesEq")
    // reversed literal-first comparison still derives (lit > ts == ts < lit)
    assert(lake.derivedGeneratedFilters(lit("2024-01-03 00:00:00") > col("ts")).size === 1)
    // a non-range conjunct on ts derives nothing (sound default)
    assert(lake.derivedGeneratedFilters(col("ts").isNotNull).isEmpty)
    // and a filter on an UNRELATED column derives nothing
    assert(lake.derivedGeneratedFilters(col("v") > 5.0).isEmpty)
    // correctness: pruned read equals a plain filtered read
    val cond = col("ts") < "2024-01-04 00:00:00"
    assert(lake.readWhere(cond).count() === df.where(cond).count())
  }

  test("non-monotone generation expressions are never used for pruning") {
    val df = Seq((1L, Timestamp.valueOf("2024-03-05 00:00:00"))).toDF("id", "ts")
    val lake = LakeTable(spark, tmp())
    lake.write(df)
    lake.addGeneratedColumn("m", org.apache.spark.sql.types.IntegerType, "month(ts)")
    // month(ts) is not monotone across years — deriving m >= month(lo)
    // from ts >= lo would WRONGLY prune January of the following year
    assert(lake.derivedGeneratedFilters(col("ts") >= "2024-03-01 00:00:00").isEmpty)
  }
}
