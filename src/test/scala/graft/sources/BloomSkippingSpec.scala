package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Per-file bloom-filter skipping (LakeTable.collectStats bloomFor):
  * point lookups on a high-cardinality column must prune files that
  * min/max bounds alone cannot, and never lose a row to a false
  * negative (blooms have none).
  */
class BloomSkippingSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_bloomtest").resolve("t").toString

  private def roundRobinLake(): (LakeTable, org.apache.spark.sql.DataFrame) = {
    val o = Tables(spark, sf0001).orders
    val lake = LakeTable(spark, tmp())
    // round-robin into 8 files: every file's o_orderkey range spans the
    // whole domain, so min/max bounds can never prune a point lookup
    lake.write(o.repartition(8))
    (lake, o)
  }

  test("bloom prunes point lookups that min/max bounds cannot") {
    val (lake, o) = roundRobinLake()
    // a MEDIAN key sits inside every file's min/max range under the
    // round-robin layout (the global min/max would bounds-prune)
    val keys = o.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val key = keys(keys.length / 2)
    lake.collectStats(Seq("o_orderkey"))
    val boundsOnly = lake.prunedFiles(col("o_orderkey") === key).size
    assert(boundsOnly === 8, "round-robin layout must defeat min/max pruning")
    lake.collectStats(Seq("o_orderkey"), bloomFor = Seq("o_orderkey"))
    val withBloom = lake.prunedFiles(col("o_orderkey") === key).size
    assert(withBloom < 8, s"bloom should prune most files, kept $withBloom")
    assert(withBloom >= 1, "the file actually holding the key must survive")
  }

  test("bloom-pruned readWhere returns exactly the unpruned result") {
    val (lake, o) = roundRobinLake()
    lake.collectStats(Seq("o_orderkey"), bloomFor = Seq("o_orderkey"))
    val keys = o.orderBy("o_orderkey").limit(5)
      .collect().map(_.getLong(0)).toSeq
    val got = lake.readWhere(col("o_orderkey").isin(keys: _*))
      .orderBy("o_orderkey").collect()
    val want = o.where(col("o_orderkey").isin(keys: _*))
      .orderBy("o_orderkey").collect()
    assert(got.length === want.length)
    assert(got.map(_.getLong(0)).toSeq === want.map(_.getLong(0)).toSeq)
    // and the IN-list plan pruned below the full file count
    assert(lake.prunedFiles(col("o_orderkey").isin(keys: _*)).size < 8)
  }

  test("a key absent from the table prunes every file") {
    val (lake, o) = roundRobinLake()
    lake.collectStats(Seq("o_orderkey"), bloomFor = Seq("o_orderkey"))
    val beyond = o.agg(max("o_orderkey")).head.getLong(0) + 1000000L
    // bounds alone already prune out-of-range keys; use an IN-RANGE hole:
    // orderkeys are sparse, so some in-range value is absent
    val present = o.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val hole = (present.min until present.max).find(v => !present.contains(v))
    hole.foreach { h =>
      val kept = lake.prunedFiles(col("o_orderkey") === h).size
      assert(kept <= 2, s"absent in-range key should bloom-prune nearly all files, kept $kept")
      assert(lake.readWhere(col("o_orderkey") === h).count() === 0)
    }
    assert(lake.prunedFiles(col("o_orderkey") === beyond).isEmpty)
  }

  test("string columns bloom too") {
    val c = Tables(spark, sf0001).customer
    val lake = LakeTable(spark, tmp())
    lake.write(c.repartition(6))
    lake.collectStats(Seq("c_name"), bloomFor = Seq("c_name"))
    val name = c.orderBy("c_custkey").limit(1).select("c_name").head.getString(0)
    val kept = lake.prunedFiles(col("c_name") === name).size
    assert(kept < 6, s"string bloom should prune, kept $kept")
    assert(lake.readWhere(col("c_name") === name).count() ===
      c.where(col("c_name") === name).count())
  }

  test("bloom combines with deletion vectors and bounds on other columns") {
    val (lake, o) = roundRobinLake()
    lake.collectStats(Seq("o_totalprice"), bloomFor = Seq("o_orderkey"))
    val keys = o.orderBy("o_orderkey").limit(3).collect().map(_.getLong(0)).toSeq
    lake.deleteVectored(col("o_orderkey") === keys.head)
    val got = lake.readWhere(col("o_orderkey").isin(keys: _*))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got === keys.tail.sorted, "DV-deleted row must not surface through the bloom path")
  }

  test("wide IN-lists take the single-deserialization any-hash probe and stay exact") {
    val (lake, o) = roundRobinLake()
    lake.collectStats(Seq("o_orderkey"), bloomFor = Seq("o_orderkey"))
    // 20 literals > ExactInListProbes: the conjunctive any-hash path
    val keys = o.orderBy("o_orderkey").limit(20)
      .collect().map(_.getLong(0)).toSeq
    val got = lake.readWhere(col("o_orderkey").isin(keys: _*))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = o.where(col("o_orderkey").isin(keys: _*))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got === want, "any-hash probe must lose no rows (no false negatives)")
    // absent wide IN-list: every literal is an in-range hole -> bloom
    // still prunes through the any-hash path
    val present = o.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val holes = (present.min until present.max)
      .filterNot(present.contains).take(20).toSeq
    if (holes.size > BloomSkippingSpec.ExactProbesMirror) {
      val kept = lake.prunedFiles(col("o_orderkey").isin(holes: _*)).size
      assert(kept <= 4, s"absent wide IN-list should still bloom-prune, kept $kept")
      assert(lake.readWhere(col("o_orderkey").isin(holes: _*)).count() === 0)
    }
  }
}

object BloomSkippingSpec {
  /** Mirror of FileStats.ExactInListProbes — the test must exceed it. */
  val ExactProbesMirror = 8
}
