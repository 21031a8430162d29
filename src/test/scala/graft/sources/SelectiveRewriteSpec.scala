package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectiveRewriteSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_selrw").resolve("t").toString

  private def hfs(path: String) =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Four single-file appends with disjoint id ranges + stats. */
  private def clusteredTable(path: String): LakeTable = {
    val s = spark
    import s.implicits._
    val lake = LakeTable(spark, path)
    (0 until 4).foreach { b =>
      val rows = (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i"))
      lake.write(rows.toDF("id", "v").coalesce(1), SaveMode.Append)
    }
    lake.collectStats(Seq("id"))
  }

  private def dataFileNames(path: String): Set[String] = {
    val f = hfs(path)
    val it = f.listFiles(new HPath(path), true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val p = it.next().getPath
      val rel = p.toUri.getPath
      if (p.getName.endsWith(".parquet") &&
        !rel.contains("/" + LakeTable.LogDirName + "/") &&
        !rel.contains("/" + LakeTable.ChangesDirName + "/") &&
        !rel.contains("/" + LakeTable.StatsDirName + "/"))
        out += p.getName
    }
    out.toSet
  }

  test("selective delete rewrites only the files the predicate can touch") {
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    assert(before.size === 4)
    lake.delete(col("id") >= 100 && col("id") < 200)
    val after = dataFileNames(path)
    // three untouched files moved through the swap with their NAMES (and
    // bytes) intact; the hit file was replaced by a filtered rewrite
    assert(before.intersect(after).size === 3)
    val rows = lake.read.select("id").collect().map(_.getLong(0)).toSet
    assert(rows === ((0 until 100) ++ (200 until 400)).map(_.toLong).toSet)
    val params = lake.history.where(col("operation") === "DELETE")
      .select("operationParameters.filesRewritten", "operationParameters.filesKept")
      .collect().head
    assert(params.getString(0) === "1")
    assert(params.getString(1) === "3")
  }

  test("selective update touches one file and applies SET only to matching rows") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    lake.update(Map("v" -> lit("CHANGED")), col("id") === 250L)
    assert(before.intersect(dataFileNames(path)).size === 3)
    val changed = lake.read.where(col("v") === "CHANGED")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(changed === Seq(250L))
    assert(lake.read.count() === 400)
  }

  test("stats survive a selective rewrite: untouched files still prune") {
    val path = tmp()
    val lake = clusteredTable(path)
    lake.delete(col("id") >= 100 && col("id") < 200)
    // files 0-99, 200-299, 300-399 kept their paths AND their stats rows:
    // a predicate inside a kept range prunes to 2 files — the statted
    // match plus the stats-less REPLACEMENT file (conservatively kept
    // until the next collectStats), never the other statted ranges
    val pruned = lake.prunedFiles(col("id") === 250L)
    assert(pruned.size === 2, s"skipping lost after selective rewrite: $pruned")
    assert(lake.readWhere(col("id") === 250L).count() === 1)
  }

  test("selective delete with change feed records the deleted rows") {
    val path = tmp()
    val lake = clusteredTable(path)
    lake.delete(col("id") < 100, changeFeed = true)
    val changes = lake.readChanges()
    assert(changes.where(col("_change_type") === "delete").count() === 100)
    assert(lake.read.count() === 300)
  }

  test("predicate matching nothing keeps every file in place") {
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    lake.delete(col("id") === 99999L)
    assert(dataFileNames(path) === before)
    assert(lake.read.count() === 400)
  }

  test("without stats the full rewrite path still runs (fallback)") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = LakeTable(spark, path)
    (0 until 2).foreach { b =>
      val rows = (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"v$i"))
      lake.write(rows.toDF("id", "v").coalesce(1), SaveMode.Append)
    }
    lake.delete(col("id") < 10)
    assert(lake.read.select("id").collect().map(_.getLong(0)).toSet ===
      (10 until 20).map(_.toLong).toSet)
  }

  test("selective MERGE: point-upsert rewrites only the files holding its keys") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    // keys 150 + 160 live in file [100,200); 450 is brand-new (no file)
    lake.upsert(Seq((150L, "X"), (160L, "Y"), (450L, "Z")).toDF("id", "v"), Seq("id"))
    val after = dataFileNames(path)
    assert(before.intersect(after).size === 3,
      "three key-disjoint files must move through the merge untouched")
    val got = lake.read.where(col("id").isin(150L, 160L, 450L, 250L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((150L, "X"), (160L, "Y"), (450L, "Z"), (250L, "v250")))
    assert(lake.read.count() === 401)
    val params = lake.history.where(col("operation") === "MERGE")
      .select("operationParameters.filesRewritten",
        "operationParameters.filesKept", "operationParameters.selective")
      .collect().head
    assert(params.getString(0) === "1" && params.getString(1) === "3"
      && params.getString(2) === "true")
  }

  test("selective MERGE: insert-only batch keeps every file, inserts still land") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    // keys far outside every file's range: zero affected files
    lake.upsert(Seq((900L, "new1"), (901L, "new2")).toDF("id", "v"), Seq("id"))
    assert(dataFileNames(path).intersect(before).size === 4,
      "no existing file may be rewritten by an insert-only merge")
    assert(lake.read.count() === 402)
    assert(lake.read.where(col("id") >= 900).count() === 2)
  }

  test("selective MERGE: wide multi-row batch falls back to range pruning, stays exact") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    spark.conf.set(LakeTable.MergeInListThresholdKey, "1") // force range path
    try {
      lake.upsert(Seq((10L, "A"), (20L, "B")).toDF("id", "v"), Seq("id"))
    } finally spark.conf.unset(LakeTable.MergeInListThresholdKey)
    val got = lake.read.where(col("id").isin(10L, 20L, 30L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((10L, "A"), (20L, "B"), (30L, "v30")))
    assert(lake.read.count() === 400)
    // range [10,20] touches only the first file
    val params = lake.history.where(col("operation") === "MERGE")
      .select("operationParameters.filesRewritten", "operationParameters.filesKept")
      .collect().head
    assert(params.getString(0) === "1" && params.getString(1) === "3")
  }

  test("selective CONDITIONAL merge: clauses + delete + gated insert, files pruned") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    val before = dataFileNames(path)
    // 110 updates in place, 120 deleted, 900 gated-in, 901 gated-out
    val batch = Seq(
      (110L, "upd", false), (120L, "x", true), (900L, "in", false), (901L, "out", false)
    ).toDF("id", "v", "del")
    lake.merge(batch, Seq("id"),
      whenMatched = Seq(
        MergeClause.DeleteWhen(Some(col("s.del"))),
        MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      insertCond = Some(col("v") =!= "out"))
    assert(dataFileNames(path).intersect(before).size === 3,
      "only the [100,200) file may be rewritten")
    val got = lake.read.where(col("id").isin(110L, 120L, 900L, 901L, 250L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((110L, "upd"), (900L, "in"), (250L, "v250")))
    assert(lake.read.count() === 400) // -1 delete +1 insert
    val params = lake.history.where(col("operation") === "MERGE")
      .select("operationParameters.selective", "operationParameters.filesRewritten")
      .collect().head
    assert(params.getString(0) === "true" && params.getString(1) === "1")
  }

  test("BY SOURCE clauses and changeFeed force the full rewrite (pruned files hold targets)") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    // BY SOURCE touches rows in every file — selective would be WRONG
    lake.merge(Seq((110L, "u")).toDF("id", "v"), Seq("id"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      whenNotMatchedBySource = Seq(MergeClause.DeleteWhen(Some(col("t.id") >= 350))))
    assert(lake.read.count() === 350, "BY SOURCE delete must reach every file")
    assert(lake.read.where(col("id") === 110).head.getString(1) === "u")
    // no commit of this table carries a `selective` tag at all
    assert(!lake.history.select("operationParameters.*").columns.contains("selective"),
      "BY SOURCE merge must not take the selective path")

    // changeFeed needs pre-merge plans over the whole table
    lake.collectStats(Seq("id"))
    lake.merge(Seq((10L, "cf")).toDF("id", "v"), Seq("id"),
      whenMatched = Seq(MergeClause.UpdateWhen(Map("v" -> col("s.v")))),
      changeFeed = true)
    val changes = lake.readChanges().where(col("_change_type") === "update_postimage")
    assert(changes.count() === 1)
  }

  test("schema-evolving merge on a statted table takes the full rewrite and succeeds") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path) // has stats on id — selective WOULD engage
    // source carries a new column: the affected-file read would come back
    // with the old schema, so the widened merge must bypass selective
    lake.upsert(Seq((150L, "X", 7L)).toDF("id", "v", "extra"),
      Seq("id"), schemaEvolution = true)
    val row = lake.read.where(col("id") === 150).collect().head
    assert(row.getString(1) === "X" && row.getLong(2) === 7L)
    assert(lake.read.where(col("id") === 250).collect().head.isNullAt(2),
      "pre-existing rows null-fill the evolved column")
    assert(lake.read.count() === 400)
  }

  test("selective MERGE matches the full-rewrite result exactly (no stats vs stats)") {
    val s = spark
    import s.implicits._
    val batch = Seq((50L, "P"), (150L, "Q"), (777L, "R")).toDF("id", "v")
    val withStats = tmp(); val noStats = tmp()
    clusteredTable(withStats).upsert(batch, Seq("id"))
    val plain = LakeTable(spark, noStats)
    (0 until 4).foreach { b =>
      val rows = (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i"))
      plain.write(rows.toDF("id", "v").coalesce(1), SaveMode.Append)
    }
    plain.upsert(batch, Seq("id"))
    val a = LakeTable(spark, withStats).read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = plain.read.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(a === b)
  }

  test("compactSmall consolidates only sub-threshold files; big files keep their bytes") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = LakeTable(spark, path)
    // one big file (100k rows) + five tiny appends
    lake.write((0 until 100000).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1),
      SaveMode.Overwrite)
    (0 until 5).foreach { b =>
      lake.write(Seq((1000000L + b, "tiny")).toDF("id", "v").coalesce(1), SaveMode.Append)
    }
    val before = dataFileNames(path)
    assert(before.size === 6)
    val f = hfs(path)
    val bigName = f.listFiles(new HPath(path), true) match { case it =>
      var biggest: (String, Long) = ("", -1L)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet") && st.getLen > biggest._2)
          biggest = (st.getPath.getName, st.getLen)
      }
      biggest._1
    }
    lake.compactSmall(minFileBytes = 16 * 1024)
    val after = dataFileNames(path)
    assert(after.contains(bigName), "the big file must move through untouched")
    assert(after.size === 2, s"five tiny files must consolidate into one (got $after)")
    assert(lake.read.count() === 100005)
    assert(lake.history.where(col("operation") === "COMPACT SMALL").count() === 1)
    // idempotent: a second pass finds one small file -> no-op, no commit
    val versions = lake.history.count()
    lake.compactSmall(minFileBytes = 16 * 1024)
    assert(lake.history.count() === versions)
  }

  test("streamTo autoCompactEvery keeps the file count bounded across batches") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_autocompact")
    val lake = LakeTable(spark, s"$dir/t")
    (0 until 6).foreach { b =>
      graft.streaming.LakeSink.writeBatch(
        lake, Seq((b.toLong, "x")).toDF("id", "v").coalesce(1), b.toLong)
      if (b % 3 == 2) lake.compactSmall(minFileBytes = 16 * 1024)
    }
    assert(lake.read.count() === 6)
    assert(dataFileNames(s"$dir/t").size <= 2,
      "periodic compactSmall must bound the small-file count")
  }

  test("a crashed selective swap is COMPLETED by vacuumDebris, not discarded") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = clusteredTable(path)
    val expected = lake.read.where(!(col("id") >= 100 && col("id") < 200))
      .select("id").collect().map(_.getLong(0)).toSet
    val historyBefore = lake.history.count()
    val f = hfs(path)

    // hand-build the post-crash state the real swap would leave right
    // after its point of no return: staged dir holds the rewritten
    // affected file + the manifest + the moved log; the table dir still
    // has ALL original data files and no log
    val staged = s"$path${LakeTable.StageSuffix}"
    // the affected file's replacement: the 100..199 block deleted means
    // the staged rewrite of that file is EMPTY — stage an empty frame
    // with the table schema (write of 0 rows still creates the dir)
    lake.read.where(lit(false)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    // manifest lists every original file EXCEPT the affected one (its
    // replacement is already staged) — here: files NOT covering 100..199
    val manifestNames = dataFileNames(path).toSeq.filter { n =>
      val mn = spark.read.parquet(s"$path/$n").agg(min("id"))
        .collect().head.getLong(0)
      !(mn >= 100 && mn < 200)
    }
    assert(manifestNames.size === 3, s"fixture wrong: $manifestNames")
    val manifestFile = f.create(
      new HPath(staged, LakeTable.SwapManifestName), true)
    manifestFile.write(manifestNames.mkString("\n").getBytes("UTF-8"))
    manifestFile.close()
    assert(f.rename(new HPath(path, LakeTable.LogDirName),
      new HPath(staged, LakeTable.LogDirName)))

    lake.vacuumDebris()

    assert(!f.exists(new HPath(staged)), "stage should be gone")
    assert(lake.read.select("id").collect().map(_.getLong(0)).toSet === expected)
    assert(lake.history.count() === historyBefore + 1, "history lost in recovery")
  }

  test("recovery commits the interrupted op under its own name (CDC attribution)") {
    val path = tmp()
    val lake = clusteredTable(path)
    val f = hfs(path)

    // same post-crash fixture as above, but the stage also carries the
    // pending-op record the real writeManifest now leaves: a DELETE with
    // its predicate param, interrupted after the point of no return
    val staged = s"$path${LakeTable.StageSuffix}"
    lake.read.where(lit(false)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    val manifestNames = dataFileNames(path).toSeq.filter { n =>
      val mn = spark.read.parquet(s"$path/$n").agg(min("id"))
        .collect().head.getLong(0)
      !(mn >= 100 && mn < 200)
    }
    val pendFile = f.create(new HPath(staged, LakeTable.PendingOpFileName), true)
    pendFile.write(Seq(
      CommitLog.esc("DELETE"),
      s"${CommitLog.esc("predicate")}\t${CommitLog.esc("(id >= 100)\nAND (id < 200)")}"
    ).mkString("\n").getBytes("UTF-8"))
    pendFile.close()
    val manifestFile = f.create(new HPath(staged, LakeTable.SwapManifestName), true)
    manifestFile.write(manifestNames.mkString("\n").getBytes("UTF-8"))
    manifestFile.close()
    assert(f.rename(new HPath(path, LakeTable.LogDirName),
      new HPath(staged, LakeTable.LogDirName)))

    lake.vacuumDebris()

    val hist = lake.history.orderBy(col("version"))
      .select("operation", "operationParameters.predicate").collect()
    val recovered = hist.filter(_.getString(0) == "RECOVERED DELETE")
    assert(recovered.length === 1, s"expected one RECOVERED DELETE commit, " +
      s"got ops ${hist.map(_.getString(0)).mkString(",")}")
    // the multi-line predicate round-trips through esc/unesc
    assert(recovered.head.getString(1) === "(id >= 100)\nAND (id < 200)")
    // the RECOVERED commit precedes VACUUM DEBRIS so a change-feed dir at
    // the predicted (= recovered) version attributes to the op, not the vacuum
    val ops = hist.map(_.getString(0)).toSeq
    assert(ops.indexOf("RECOVERED DELETE") < ops.indexOf("VACUUM DEBRIS"))
    // no pending-op debris left in the live table dir
    assert(!f.exists(new HPath(path, LakeTable.PendingOpFileName)))
  }

  test("a completed (non-crashed) rewrite leaves no pending-op or manifest debris") {
    val path = tmp()
    val lake = clusteredTable(path)
    lake.delete(col("id") >= 100 && col("id") < 200) // selective path
    val f = hfs(path)
    assert(!f.exists(new HPath(path, LakeTable.PendingOpFileName)))
    assert(!f.exists(new HPath(path, LakeTable.SwapManifestName)))
    lake.optimize(Seq("id")) // full-rewrite path
    assert(!f.exists(new HPath(path, LakeTable.PendingOpFileName)))
    assert(!f.exists(new HPath(path, LakeTable.SwapManifestName)))
    assert(lake.history.where(col("operation").startsWith("RECOVERED")).count() === 0)
  }

  test("a crashed MID-SWAP partition overwrite is completed by vacuumDebris") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = LakeTable(spark, path).writePartitioned(
      Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("p", "id", "x"), Seq("p"))
    val f = hfs(path)

    // hand-build the post-crash state a dynamic overwrite of p=a leaves
    // right after its point of no return: a MARKED part-stage still
    // holding the replacement partition, the table untouched
    val stage = s"$path${LakeTable.PartStageSuffix}crashfix"
    Seq(("a", 1L, 99.0)).toDF("p", "id", "x")
      .write.partitionBy("p").parquet(stage)
    val pend = f.create(new HPath(stage, LakeTable.PendingOpFileName), true)
    pend.write(Seq(
      CommitLog.esc("OVERWRITE PARTITIONS"),
      s"${CommitLog.esc("mode")}\t${CommitLog.esc("dynamic")}",
      s"${CommitLog.esc("occPartitions")}\t${CommitLog.esc("p=a")}",
      s"${CommitLog.esc("partitionBy")}\t${CommitLog.esc("p")}"
    ).mkString("\n").getBytes("UTF-8"))
    pend.close()
    val man = f.create(new HPath(stage, LakeTable.SwapManifestName), true)
    man.write("p=a".getBytes("UTF-8"))
    man.close()

    // age the stage past the retention horizon (var is package-private)
    val savedRetention = LakeTable.PartStageRetentionMs
    LakeTable.PartStageRetentionMs = -60000L // horizon in the future: all aged
    try lake.vacuumDebris()
    finally LakeTable.PartStageRetentionMs = savedRetention

    assert(!f.exists(new HPath(stage)), "marked stage should be consumed, not kept")
    // the pending partition was swapped in: p=a carries the replacement,
    // p=b is untouched
    assert(lake.read.select("p", "id", "x").orderBy("id")
      .as[(String, Long, Double)].collect().toSeq ===
      Seq(("a", 1L, 99.0), ("b", 2L, 2.0)))
    // the change is attributed to the interrupted op, before the vacuum
    val ops = lake.history.orderBy(col("version"))
      .select("operation").as[String].collect().toSeq
    assert(ops.contains("RECOVERED OVERWRITE PARTITIONS"), ops.mkString(","))
    assert(ops.indexOf("RECOVERED OVERWRITE PARTITIONS") < ops.indexOf("VACUUM DEBRIS"))
  }

  test("an UNMARKED aged part-stage is reclaimed; a fresh task file keeps it alive") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = LakeTable(spark, path).writePartitioned(
      Seq(("a", 1L, 1.0)).toDF("p", "id", "x"), Seq("p"))
    val f = hfs(path)
    val stage = s"$path${LakeTable.PartStageSuffix}preswap"
    Seq(("a", 1L, 5.0)).toDF("p", "id", "x").write.partitionBy("p").parquet(stage)

    // backdate everything EXCEPT one task file: the recursive newest-mtime
    // horizon must treat the stage as live while any file inside is fresh
    val old = System.currentTimeMillis() - 24L * 3600 * 1000
    def walk(p: HPath): Seq[HPath] = {
      val st = f.getFileStatus(p)
      if (!st.isDirectory) Seq(p)
      else p +: f.listStatus(p).toSeq.flatMap(c => walk(c.getPath))
    }
    val all = walk(new HPath(stage))
    val freshFile = all.filter(q => !f.getFileStatus(q).isDirectory).head
    all.filterNot(_ == freshFile).foreach(q => f.setTimes(q, old, -1))

    lake.vacuumDebris() // default 4h retention; fresh file => kept
    assert(f.exists(new HPath(stage)),
      "a stage with a fresh task file must not be reclaimed")

    f.setTimes(freshFile, old, -1)
    lake.vacuumDebris() // now uniformly aged and UNMARKED => deleted
    assert(!f.exists(new HPath(stage)), "aged unmarked stage should be reclaimed")
    // pre-swap crash: the table was never touched
    assert(lake.read.select("x").as[Double].head() === 1.0)
  }

  test("overwritePartitions with no partition columns is rejected up front") {
    val s = spark
    import s.implicits._
    val path = tmp()
    val lake = LakeTable(spark, path).write(Seq((1L, 1.0)).toDF("id", "x"))
    val e = intercept[IllegalArgumentException] {
      lake.overwritePartitions(Seq((2L, 9.0)).toDF("id", "x"), Seq.empty)
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // and no stage dir leaked next to the table
    val parent = new HPath(path).getParent
    val leaked = hfs(path).listStatus(parent)
      .map(_.getPath.getName)
      .filter(_.startsWith(new HPath(path).getName + LakeTable.PartStageSuffix))
    assert(leaked.isEmpty, leaked.mkString(","))
  }
}
