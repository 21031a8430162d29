package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializedAggSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_mv").resolve(name).toString

  private def sorted(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("refresh after insert/update/delete equals a from-scratch recompute") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base")).write(
      Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv"),
      keys = Seq("k"), sums = Map("total" -> col("v")))
    mv.initialize()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))

    // one commit of each change type, all feeding the CDF
    base.merge(
      Seq(("a", 100L), ("d", 1L)).toDF("k2", "v").withColumnRenamed("k2", "k"),
      Seq("k"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      changeFeed = true)
    // merge updates only ONE of a's two rows? No — merge is keyed; 'a'
    // has two rows sharing the key, which merge forbids on the SOURCE
    // side only. Both target rows matched and both were updated, and
    // the feed recorded both pre/post images — refresh must agree.
    base.delete(col("k") === "b", changeFeed = true)
    base.update(Map("v" -> (col("v") + 1L)), col("k") === "c", changeFeed = true)

    mv.refresh()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
    // groups: a (2 rows now both 100), c (8), d (1); b deleted entirely
    assert(mv.read.where(col("k") === "b").count() === 0)
    assert(mv.read.where(col("k") === "d").head.getLong(1) === 1L)
  }

  test("a crash between merge and state-file save cannot double-apply a delta") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("cbase")).write(
      Seq(("a", 10L), ("b", 5L)).toDF("k", "v"))
    val viewPath = tmp("cmv")
    val mv = MaterializedAgg(spark, base, viewPath,
      keys = Seq("k"), sums = Map("total" -> col("v")))
    mv.initialize()
    val wmAfterInit = {
      val f = new org.apache.hadoop.fs.Path(viewPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(viewPath, LakeTable.LogDirName), "_mv_watermark")
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in)).trim
      finally in.close()
    }
    base.update(Map("v" -> (col("v") + 100L)), col("k") === "a", changeFeed = true)
    mv.refresh()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
    // simulate the crash window: the merge commit LANDED (it carries
    // the watermark param) but the state file write never happened —
    // roll the file back to its pre-refresh content
    val f = new org.apache.hadoop.fs.Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    LakeIo.atomicOverwrite(f, new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(viewPath, LakeTable.LogDirName), "_mv_watermark"),
      wmAfterInit)
    // the restarted refresh must see the commit-carried watermark and
    // NO-OP — a delta re-apply would double 'a' to +200
    mv.refresh()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
    assert(mv.read.where(col("k") === "a").head.getAs[Long]("total") === 110L)
  }

  test("startStream keeps the view current as the base table commits") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("sbase")).write(
      Seq(("a", 10L), ("b", 5L), ("c", 7L), ("c", 3L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("smv"),
      keys = Seq("k"), sums = Map("total" -> col("v")))
    mv.initialize()
    // seed the change feed so the streaming source has a schema to read
    base.delete(col("v") === 5L, changeFeed = true)
    val q = mv.startStream(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(sorted(mv.read) === sorted(mv.aggregate(base.read)),
        "view stale after the delete commit")
      base.update(Map("v" -> (col("v") * 10L)), col("k") === "c", changeFeed = true)
      q.processAllAvailable()
      assert(sorted(mv.read) === sorted(mv.aggregate(base.read)),
        "view stale after the update commit")
      base.upsert(Seq(("d", 42L), ("a", 1L)).toDF("k", "v"), Seq("k"),
        changeFeed = true)
      q.processAllAvailable()
      assert(sorted(mv.read) === sorted(mv.aggregate(base.read)),
        "view stale after the upsert commit")
    } finally q.stop()
  }

  test("refresh is idempotent and no-ops without new changes") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base2")).write(
      Seq(("x", 1L), ("y", 2L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv2"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    val before = sorted(mv.read)
    mv.refresh().refresh()
    assert(sorted(mv.read) === before)
    base.delete(col("k") === "x", changeFeed = true)
    mv.refresh()
    val after = sorted(mv.read)
    assert(after === sorted(mv.aggregate(base.read)))
    // a second refresh with the watermark advanced applies nothing
    mv.refresh()
    assert(sorted(mv.read) === after)
  }

  test("commits without change sets advance the watermark without breaking refresh") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base3")).write(
      Seq(("p", 3L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv3"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    base.collectStats(Seq("v")) // a commit with no recorded change set
    mv.refresh()
    base.update(Map("v" -> lit(9L)), col("k") === "p", changeFeed = true)
    mv.refresh()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
  }

  test("refresh ignores change sets beyond the committed head (feed corruption guard)") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base5")).write(
      Seq(("a", 10L), ("b", 5L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv5"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    base.delete(col("k") === "b", changeFeed = true)
    mv.refresh()
    val settled = sorted(mv.read)
    // the library itself never exposes an uncommitted set (publication
    // is post-commit), but an externally planted / corrupted feed dir
    // beyond the head must still be ignored, not applied
    Seq(("a", 10L)).toDF("k", "v")
      .withColumn("_change_type", lit("delete"))
      .write.parquet(s"${base.path}/${LakeTable.ChangesDirName}/v999")
    mv.refresh()
    assert(sorted(mv.read) === settled,
      "refresh must not apply a change set beyond the latest committed version")
    mv.refresh() // and never double-applies once ignored
    assert(sorted(mv.read) === settled)
  }

  test("stream ignores a beyond-head change set and repairs once its commit exists") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base6")).write(
      Seq(("a", 10L), ("b", 5L), ("c", 7L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv6"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    base.delete(col("k") === "c", changeFeed = true) // seed the feed
    val q = mv.startStream(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
      // an externally planted set at the version the NEXT commit will
      // take (the library never does this — publication is post-commit):
      // the watermark bound must ignore it until that commit exists
      val inFlight = base.history
        .agg(max(col("version"))).head.getLong(0) + 1
      Seq(("b", 5L)).toDF("k", "v")
        .withColumn("_change_type", lit("delete"))
        .write.parquet(s"${base.path}/${LakeTable.ChangesDirName}/v$inFlight")
      val before = sorted(mv.read)
      q.processAllAvailable() // triggers on the new file; must NOT block or apply
      assert(sorted(mv.read) === before,
        "an uncommitted change set must be deferred, not applied")
      // the writer's commit lands (same content as the staged change set),
      // then a later change-feed commit fires the trigger that repairs both
      base.delete(col("k") === "b") // commits version `inFlight`
      base.update(Map("v" -> (col("v") + 1L)), col("k") === "a", changeFeed = true)
      q.processAllAvailable()
      assert(sorted(mv.read) === sorted(mv.aggregate(base.read)),
        "the deferred set and the new commit must both apply on the next trigger")
    } finally q.stop()
  }

  test("null measures contribute zero identically in full and incremental paths") {
    val s = spark
    import s.implicits._
    // g holds a NULL measure from the start: initialize must count it
    // as 0, and the deletes flowing through the feed must subtract 0
    // for it — or the group's total drifts from the recompute
    val base = LakeTable(spark, tmp("base4")).write(
      Seq(("g", Some(4L)), ("g", None)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv4"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    assert(mv.read.where(col("k") === "g").head.getLong(2) === 4L)
    // delete every g row (one of them null-valued); insert a null h
    base.merge(
      Seq(("g", 10L)).toDF("k", "v"), Seq("k"),
      whenMatched = Seq(MergeClause.DeleteWhen(None)),
      insertUnmatched = false, changeFeed = true)
    base.merge(
      Seq(("h", None: Option[Long])).toDF("k", "v"), Seq("k"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      changeFeed = true)
    mv.refresh()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
    assert(mv.read.where(col("k") === "g").count() === 0)
    val h = mv.read.where(col("k") === "h").head
    assert(h.getLong(1) === 1L && h.getLong(2) === 0L)
  }

  test("refresh fails loudly when the feed was vacuumed past the watermark") {
    val s = spark
    import s.implicits._
    val base = LakeTable(spark, tmp("base5")).write(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    val mv = MaterializedAgg(spark, base, tmp("mv5"),
      keys = Seq("k"), sums = Map("total" -> col("v"))).initialize()
    // two change sets the MV never applied, then retention removes the
    // first: the history the MV needs is gone. Applying only the
    // surviving set would corrupt the view silently — refresh must
    // throw instead (and must NOT mistake this for the benign
    // "commits but no change sets" IllegalArgumentException path).
    base.update(Map("v" -> lit(10L)), col("k") === "a", changeFeed = true)
    base.update(Map("v" -> lit(20L)), col("k") === "b", changeFeed = true)
    base.vacuumChanges(retainLast = 1)
    intercept[IllegalStateException] { mv.refresh() }
    // the view was not advanced past the gap: rebuilding recovers
    mv.initialize()
    assert(sorted(mv.read) === sorted(mv.aggregate(base.read)))
  }
}
