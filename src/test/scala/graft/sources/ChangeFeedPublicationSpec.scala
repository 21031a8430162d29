package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.text.InvertedIndex

/** The change-set publication contract: sets are IMMUTABLE ONCE VISIBLE.
  * A set materializes under a dot-prefixed staging name invisible to
  * every reader, and one post-commit rename publishes it at the version
  * its commit won — so a live CDC file stream can never list a change
  * file that a later rename, delete, or staged-swap move unlinks.
  *
  * The race this pins (witnessed as FAILED_READ_FILE.FILE_NOT_EXIST
  * killing a live index-maintenance stream): the old layout wrote change
  * files at a PREDICTED version pre-commit (renamed on prediction miss,
  * deleted on abort) and moved the whole `_graft_changes` dir through
  * the staged-swap rename, leaving windows in which a hot-trigger
  * poller's listed files had no path. The tight loop below drives a
  * ProcessingTime(0) maintenance stream against a writer hammering
  * staged rewrites — with the old layout it dies within a few
  * iterations; with immutable publication and the child-wise swap it
  * must survive all of them.
  */
class ChangeFeedPublicationSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot = Files.createTempDirectory("graft_cdf_pub").toString

  private def hfs(path: String) =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("race loop: staged rewrites never kill a hot-trigger maintenance stream") {
    val root = freshRoot
    val base = LakeTable(spark, s"$root/docs").write(
      Seq.tabulate(40)(i => (i.toLong, s"apple banana word$i cherry"))
        .toDF("doc_id", "text"))
    val dir = s"$root/idx"
    InvertedIndex.build(base, "doc_id", "text", dir)
    base.delete(col("doc_id") === 39L, changeFeed = true) // seed the feed
    val q = InvertedIndex.startMaintenanceStream(base, "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L))
    try {
      // every iteration is a full or selective STAGED REWRITE racing the
      // poller: upserts and deletes emit change sets the stream must see
      // exactly once; the interleaved optimize/compact are the
      // content-preserving swaps whose dir moves killed the old layout
      for (i <- 0 until 24) {
        i % 4 match {
          case 0 => base.upsert(
            Seq((100L + i, s"grape durian fresh$i")).toDF("doc_id", "text"),
            Seq("doc_id"), changeFeed = true)
          case 1 => base.update(
            Map("text" -> concat(col("text"), lit(s" upd$i"))),
            col("doc_id") === (i % 20).toLong, changeFeed = true)
          case 2 => base.delete(
            col("doc_id") === (200L + i), changeFeed = true) // often no-op rows, still a swap
          case 3 => base.compact()
        }
        assert(q.exception.isEmpty,
          s"maintenance stream died during iteration $i: ${q.exception}")
      }
      // final feed commit: the stream's fold is stamp→head, so this one
      // trigger also folds any notification consumed as a no-op while a
      // swap briefly hid the log
      base.upsert(Seq((999L, "grape finale")).toDF("doc_id", "text"),
        Seq("doc_id"), changeFeed = true)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"maintenance stream died: ${q.exception}")
      // zero divergence from a rebuild: the stream saw every change set
      // exactly once despite the swaps
      val rebuilt = s"$root/idx2"
      InvertedIndex.build(base, "doc_id", "text", rebuilt)
      def served(d: String) = InvertedIndex
        .serveBm25(spark, d,
          Seq(1L -> "grape", 2L -> "banana", 3L -> "apple")
            .toDF("query_id", "term"), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(served(dir) === served(rebuilt))
    } finally q.stop()
  }

  test("race loop: view refresh retries torn base scans instead of dying") {
    // the OTHER consumer-side race (caught by CdcRaceProbe): a lake
    // read is a directory scan, so a refresh's live fact/dim scan can
    // list files a concurrent writer's swap then deletes — Spark fails
    // the task (never a silent torn mix) and retryTornRead re-plans;
    // without it the join-view stream died within ~2 writer iterations
    val root = freshRoot
    val fact = LakeTable(spark, s"$root/fact").write(
      Seq.tabulate(30)(i => (i.toLong, s"k${i % 4}", i * 1.0)).toDF("id", "k", "v"))
    val dim = LakeTable(spark, s"$root/dim").write(
      Seq.tabulate(4)(i => (s"k$i", s"name$i")).toDF("k", "name"))
    val mv = new MaterializedJoin(spark, fact, dim, s"$root/mv", "id", "k")
      .initialize()
    fact.update(Map("v" -> (col("v") + lit(0.5))), col("id") === 0L,
      changeFeed = true)
    dim.update(Map("name" -> lit("name0b")), col("k") === "k0",
      changeFeed = true)
    val q = mv.startStream(Trigger.ProcessingTime(0L))
    try {
      for (i <- 0 until 12) {
        // every iteration swaps a table the refresh scans live: the
        // dim update tears the re-join read, the fact update tears the
        // dim-touch semi-join read
        dim.update(Map("name" -> concat(col("name"), lit(s"-$i"))),
          col("k") === s"k${i % 4}", changeFeed = true)
        fact.upsert(Seq((100L + i, s"k${i % 4}", i * 2.0)).toDF("id", "k", "v"),
          Seq("id"), changeFeed = true)
        assert(q.exception.isEmpty,
          s"join-view stream died during iteration $i: ${q.exception}")
      }
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"join-view stream died: ${q.exception}")
      // exactly-once despite every retry: the view equals a recompute
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(rows(mv.read) === rows(mv.recompute()))
    } finally q.stop()
  }

  test("change sets are invisible until their commit lands; aborts leave no trace") {
    val root = freshRoot
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
      .addConstraint("x_positive", "x > 0")
    lake.upsert(Seq((1L, 11.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    val before = lake.readChanges().count()
    // a constraint-violating update with the feed on: the mutation
    // aborts pre-swap, and its staged change set must be discarded —
    // never published, never listed
    intercept[Exception] {
      lake.update(Map("x" -> lit(-5.0)), col("id") === 1L, changeFeed = true)
    }
    assert(lake.readChanges().count() === before,
      "an aborted mutation must not publish a change set")
    val feedDir = new HPath(s"${lake.path}/${LakeTable.ChangesDirName}")
    val leftover = hfs(lake.path).listStatus(feedDir).map(_.getPath.getName)
      .filter(_.startsWith(LakeTable.ChangeStagePrefix))
    assert(leftover.isEmpty,
      s"aborted mutation leaked change-set stages: ${leftover.mkString(", ")}")
    // published dirs are version-named only — the publication rename is
    // the ONLY path from stage to visibility
    val names = hfs(lake.path).listStatus(feedDir).map(_.getPath.getName)
    assert(names.forall(_.matches("v\\d+")), names.mkString(", "))
  }

  test("a committed-but-unpublished change set is waited for, never watermarked past") {
    // the inverted publication order (commit record BEFORE the v-dir
    // rename) opens a window where the log's latest version has no
    // listable change set yet — a consumer bounding by the committed
    // latest would advance its watermark over the delta and lose it
    // FOREVER (the set's later publication triggers a below-watermark
    // no-op). publishedFrontier stops consumers just below it.
    val root = freshRoot
    val base = LakeTable(spark, s"$root/t").write(
      Seq(("a", 10L), ("b", 5L)).toDF("k", "v"))
    val mv = new MaterializedAgg(spark, base, s"$root/mv", Seq("k"),
      Map("total" -> org.apache.spark.sql.functions.col("v"))).initialize()
    base.update(Map("v" -> lit(100L)), col("k") === "a", changeFeed = true)
    val v = base.currentVersion
    // simulate the mid-publication window: the commit record exists and
    // CLAIMS its stage, but the v-dir is not yet renamed into place
    val f = hfs(base.path)
    val published = new HPath(s"${base.path}/${LakeTable.ChangesDirName}/v$v")
    val claimed = base.history.where(col("version") === v)
      .select(col("operationParameters")(LakeTable.ChangeStageParam))
      .head.getString(0)
    assert(claimed != null && claimed.startsWith(LakeTable.ChangeStagePrefix))
    val stage = new HPath(s"${base.path}/${LakeTable.ChangesDirName}/$claimed")
    assert(f.rename(published, stage), "test setup: unpublish the set")
    assert(base.publishedFrontier(-1L) === v - 1)
    mv.refresh()
    // the refresh must NOT have folded (or skipped!) the unpublished set
    assert(mv.read.where(col("k") === "a").head.getAs[Long]("total") === 10L)
    // publication lands; the next refresh folds it — nothing was lost
    assert(f.rename(stage, published), "test setup: publish the set")
    assert(base.publishedFrontier(-1L) === v)
    mv.refresh()
    assert(mv.read.where(col("k") === "a").head.getAs[Long]("total") === 100L)
  }

  test("vacuumDebris deletes unclaimed change-set stages (pre-commit crash debris)") {
    val root = freshRoot
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0)).toDF("id", "x"))
    lake.upsert(Seq((1L, 11.0)).toDF("id", "x"), Seq("id"), changeFeed = true)
    // simulate a writer that crashed after materializing its change set
    // but before committing: a stage dir NO commit claims
    val stage = s"${lake.path}/${LakeTable.ChangesDirName}/" +
      s"${LakeTable.ChangeStagePrefix}deadbeef00000000"
    Seq((1L, 12.0)).toDF("id", "x")
      .withColumn("_change_type", lit("delete"))
      .write.parquet(stage)
    // invisible to every reader while staged
    assert(lake.readChanges().select("_commit_version").distinct().count() === 1)
    // a FRESH unclaimed stage survives the vacuum — it may belong to a
    // live writer still mid-rewrite whose commit will claim it
    lake.vacuumDebris()
    assert(hfs(lake.path).exists(new HPath(stage)),
      "vacuumDebris must not reap a stage inside the retention horizon")
    // past the age horizon it is crash debris and is reclaimed
    val f = hfs(lake.path)
    val old = System.currentTimeMillis() - LakeTable.PartStageRetentionMs - 60000L
    def ageRec(p: HPath): Unit = {
      f.setTimes(p, old, -1)
      if (f.getFileStatus(p).isDirectory) f.listStatus(p).foreach(st => ageRec(st.getPath))
    }
    ageRec(new HPath(stage))
    lake.vacuumDebris()
    assert(!f.exists(new HPath(stage)),
      "vacuumDebris must reclaim an unclaimed change-set stage past the horizon")
    // and the claimed, published history is untouched
    assert(lake.readChanges().select("_commit_version").distinct().count() === 1)
  }
}
