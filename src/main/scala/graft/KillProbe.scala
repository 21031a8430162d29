package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable
import graft.streaming.LakeSink

/** Hard-kill (SIGKILL) crash probe (not part of the driver contract).
  *
  * CrashInjectionSpec walks every driver-side METADATA mutation with a
  * deterministic in-JVM fuse — but a fuse cannot model two things a real
  * process death does:
  *
  *   1. TORN FILE CONTENT. The fuse throws at `create(...)` call
  *      boundaries; a SIGKILL can land between a create and its
  *      flush/close, leaving a metadata file that EXISTS but is empty or
  *      half-written. A recovery that reads such a marker as "nothing to
  *      do" and then attributes the operation loses data silently.
  *   2. RECOVERY BY A DIFFERENT PROCESS. The fuse's convergence asserts
  *      run in the same JVM with warm session state; here the writer is
  *      a forked child JVM killed at arbitrary points, and the PARENT
  *      (and then a fresh child — the at-least-once replay) must
  *      converge from the files alone.
  *
  * Three writer behaviors are killed repeatedly at staggered offsets and
  * must converge after each kill under the documented recovery
  * (`vacuumDebris()` + restart-the-sink):
  *
  *   - sink:        tagged multi-file appends (LakeSink.writeBatch — the
  *                  exactly-once streaming contract; multi-file batches
  *                  make promotion atomicity observable)
  *   - sinkcompact: the same interleaved with compactSmall (maintenance
  *                  swap under fire)
  *   - upsert:      staged CDC merges (swap + change-set publication)
  *
  * Audit after every kill (post-vacuumDebris): no duplicate keys, every
  * batch all-or-nothing, applied batches downward-closed, a committed
  * txn tag implies its batch's rows are ALL present. Final audit after
  * an uninterrupted replay run: every batch exactly once, versions
  * contiguous, change feed folds to the table state, zero stage/claim
  * debris.
  *
  * Usage: runMain graft.KillProbe [kills [nBatches]]
  */
object KillProbe {

  private def fsFor(spark: org.apache.spark.sql.SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Fork a writer child and SIGKILL it once the table's commit count
    * reaches `minCommits` (so successive kills land progressively later
    * in the batch sequence) plus a jitter sleep (so within a batch the
    * kill lands at varying phases: stage write, promotion, commit,
    * change-set publication). Returns true if the child was actually
    * killed mid-run (false = finished first).
    */
  private def forkAndKill(
      spark: org.apache.spark.sql.SparkSession, table: String,
      args: Seq[String], log: String, flag: String,
      minCommits: Long, jitterMs: Long): Boolean = {
    val p = CrossProcessProbe.forkJvm("graft.KillProbeWriterMain", args, log)
    val deadline = System.currentTimeMillis() + 180000L
    while (!Files.exists(Paths.get(flag)) && p.isAlive &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    require(Files.exists(Paths.get(flag)) || !p.isAlive,
      s"writer child never signalled start — see $log")
    // poll the commit log (cheap: one dir listing) until the child has
    // visibly progressed past the target batch count. The child's
    // staged rewrites MOVE the log dir through the swap (index folds do
    // this every batch), so the poll's exists→list can land mid-move —
    // a transient listing failure means "mid-swap", not a dead table
    def versionNow(): Long =
      try LakeTable(spark, table).currentVersion
      catch { case _: java.io.IOException => -1L }
    while (p.isAlive && versionNow() < minCommits &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    Thread.sleep(jitterMs)
    val killed = p.isAlive
    p.destroyForcibly(): Unit
    require(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "killed child did not terminate")
    Files.deleteIfExists(Paths.get(flag)): Unit
    killed
  }

  def main(args: Array[String]): Unit = {
    val kills = args.headOption.map(_.toInt).getOrElse(6)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(36)
    val modes = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("sink", "sinkcompact", "upsert", "index"))
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_kill").toString
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]

    modes.foreach { mode =>
      val table = s"$root/$mode/t"
      val appId = s"kill-$mode"
      // upsert (MERGE) requires an existing target, like Delta — seed it
      if (mode == "upsert") {
        import spark.implicits._
        LakeTable(spark, table).write(
          Seq((-1L, -1L, "seed")).toDF("id", "batch", "payload")): Unit
      }
      // index mode: the child upserts docs AND folds the standing BM25
      // index per batch — kills land inside the multi-table fold
      // (removals / postings append / df merge / stats / stamp), the
      // sequence whose crash-exactness nothing else exercises. Parent
      // seeds the corpus and builds the index the children maintain.
      if (mode == "index") {
        import spark.implicits._
        val docs = LakeTable(spark, table)
        docs.write((0L until 20L).map(i =>
          (i, s"seed doc $i tok${i % 7} tok${(i + 3) % 11}"))
          .toDF("doc_id", "text")): Unit
        graft.text.InvertedIndex.build(docs, "doc_id", "text", s"$root/$mode/idx")
      }
      var actualKills = 0
      var progress = 0L
      (0 until kills).foreach { k =>
        val flag = s"$root/$mode.started.$k"
        // each kill waits for ~2 more commits than the last one reached,
        // so the walk covers early AND late batches; the jitter varies
        // the intra-batch phase the SIGKILL lands in
        val minCommits = progress + 2
        val jitter = (k * 173) % 450
        val killed = forkAndKill(spark, table,
          Seq(table, mode, nBatches.toString, appId, flag,
            s"$root/$mode.out.$k.json"),
          s"$root/$mode.child.$k.log", flag, minCommits, jitter)
        if (killed) actualKills += 1
        // documented crashed-client recovery, run by a DIFFERENT process
        val lake = LakeTable(spark, table)
        lake.vacuumDebris(): Unit
        if (mode == "index")
          // the index's three lakes are ordinary tables: a kill inside a
          // terms merge can strand its stage claim, which the next
          // fold's merge must not inherit
          Seq("postings", "terms", "stats").foreach { s =>
            val t = LakeTable(spark, s"$root/$mode/idx/$s")
            if (t.exists) t.vacuumDebris(): Unit
          }
        // progress AFTER recovery, so its VACUUM/RECOVERED commits are
        // baked into the next target and each kill genuinely waits for
        // ~2 fresh CHILD commits — not recovery's own records
        progress = math.max(progress, lake.currentVersion)
        audit(spark, table, mode, appId,
          s"$mode kill#$k (>=$minCommits commits + ${jitter}ms)")
      }
      // final uninterrupted run: the at-least-once replay from batch 0 —
      // committed batches must be SKIPPED, missing ones applied
      val flag = s"$root/$mode.started.final"
      val p = CrossProcessProbe.forkJvm("graft.KillProbeWriterMain",
        Seq(table, mode, nBatches.toString, appId, flag,
          s"$root/$mode.final.json"),
        s"$root/$mode.final.log")
      require(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS) &&
        p.exitValue() == 0,
        s"final $mode run failed — see $root/$mode.final.log")
      val nApplied = finalAudit(spark, table, mode, appId, nBatches)
      val unit = if (mode == "index") "docs" else "batches"
      println(s"[killprobe] $mode: $actualKills/$kills kills landed mid-run, " +
        s"final state exact ($nApplied $unit, 0 duplicates, 0 debris)")
      results += ((mode, actualKills, nApplied))
    }
    val js = results.map { case (m, a, n) => s""""$m":{"kills":$a,"batches":$n}""" }
      .mkString("{", ",", "}")
    println(s"""{"probe":"kill","kills_per_mode":$kills,"modes":$js}""")
    spark.stop()
  }

  /** Invariants that must hold IMMEDIATELY after recovery, before any
    * replay: exactness of what exists, not completeness.
    */
  private def audit(
      spark: org.apache.spark.sql.SparkSession, table: String,
      mode: String, appId: String, what: String): Unit = {
    val lake = LakeTable(spark, table)
    if (!fsFor(spark, table).exists(new org.apache.hadoop.fs.Path(table))) return
    if (mode == "index") {
      // the standing index's hard invariant at ANY instant: a posting is
      // keyed (term, doc_id) — a duplicate means a crashed fold was
      // re-applied non-idempotently (double append / double df delta)
      val pDir = new org.apache.hadoop.fs.Path(table).getParent.toString + "/idx/postings"
      val p = LakeTable(spark, pDir)
      if (p.exists) {
        val dups = p.read.groupBy("term", "doc_id").count()
          .where(col("count") > 1).count()
        require(dups == 0,
          s"$what: $dups duplicated (term, doc_id) postings after recovery")
      }
      val docDups = lake.read.groupBy("doc_id").count()
        .where(col("count") > 1).count()
      require(docDups == 0, s"$what: $docDups duplicated doc_ids")
      return
    }
    // a kill before the first batch ever committed can leave a dir with
    // no readable data yet — nothing to audit
    val df =
      try lake.read.cache()
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    try {
      if (df.isEmpty) return
      val dups = df.groupBy("id").count().where(col("count") > 1).count()
      require(dups == 0, s"$what: $dups duplicated ids after recovery")
      if (mode != "upsert") {
        val rows = KillProbeWriterMain.RowsPerBatch
        val perBatch = df.groupBy("batch").count()
          .where(col("count") =!= rows).count()
        require(perBatch == 0,
          s"$what: $perBatch batches are PARTIAL after recovery " +
            "(all-or-nothing violated)")
        val present = df.select("batch").distinct()
          .collect().map(_.getLong(0)).sorted
        require(present.sameElements(present.indices.map(_.toLong)),
          s"$what: applied batches not downward-closed: ${present.mkString(",")}")
        val tagged = lake.maxCommitParamLong(LakeSink.TxnKeyPrefix + appId)
        require(tagged < present.length,
          s"$what: commit tag $tagged recorded but only ${present.length} " +
            "batches present (a commit lied)")
      } else {
        // mid-kill invariants for upserts must respect at-least-once
        // replay: a restarted client re-applies from batch 0, so an
        // overlap key can legitimately carry an EARLIER batch's value
        // until the replay catches up (the CDC feed records the revert
        // faithfully). What can never happen: a torn value (id carrying
        // a batch that does not cover it — no upsert ever wrote that
        // pair) or a gap in the id range (inserts are sequential and
        // replay re-inserts). id -1 is the parent's seed row.
        val batches = df.where(col("id") >= 0)
        if (!batches.isEmpty) {
          val torn = batches.where(
            col("id") < col("batch") * KillProbeWriterMain.UpsertStride ||
            col("id") >= col("batch") * KillProbeWriterMain.UpsertStride +
              KillProbeWriterMain.UpsertSpan).count()
          require(torn == 0, s"$what: $torn ids carry a (id, batch) pair " +
            "no upsert ever wrote — torn merge state")
          val (cnt, maxId) = {
            val r = batches.agg(count(lit(1)), max("id")).collect()(0)
            (r.getLong(0), r.getLong(1))
          }
          require(cnt == maxId + 1,
            s"$what: id range has gaps ($cnt ids, max id $maxId)")
        }
      }
    } finally { df.unpersist(): Unit }
  }

  /** Full exactness after the uninterrupted replay run; returns batches. */
  private def finalAudit(
      spark: org.apache.spark.sql.SparkSession, table: String,
      mode: String, appId: String, nBatches: Int): Int = {
    audit(spark, table, mode, appId, s"$mode final")
    val lake = LakeTable(spark, table)
    val df = lake.read
    if (mode == "index") {
      // ground truth: a FRESH index built from the final corpus must be
      // content-identical to the one maintained through 6 kills — the
      // incremental fold's exactness oracle (postings and vocabulary
      // row-exact; corpus scalars to float tolerance, since incremental
      // arithmetic and a recompute may differ in summation order)
      val root = new org.apache.hadoop.fs.Path(table).getParent.toString
      graft.text.InvertedIndex.build(lake, "doc_id", "text", s"$root/idx_rebuilt")
      def diff(sub: String, cols: Seq[String]): Long = {
        val a = LakeTable(spark, s"$root/idx/$sub").read.select(cols.map(col): _*)
        val b = LakeTable(spark, s"$root/idx_rebuilt/$sub").read.select(cols.map(col): _*)
        a.exceptAll(b).count() + b.exceptAll(a).count()
      }
      val pd = diff("postings", Seq("term", "doc_id", "tf", "dl"))
      require(pd == 0, s"index final: maintained postings diverge from a fresh rebuild on $pd rows")
      val td = diff("terms", Seq("term", "df"))
      require(td == 0, s"index final: maintained vocabulary diverges from a fresh rebuild on $td rows")
      val Array(mN, mAvg) = LakeTable(spark, s"$root/idx/stats").read
        .select("n_docs", "avgdl").head().toSeq.map(_.toString.toDouble).toArray
      val Array(rN, rAvg) = LakeTable(spark, s"$root/idx_rebuilt/stats").read
        .select("n_docs", "avgdl").head().toSeq.map(_.toString.toDouble).toArray
      require(mN == rN && math.abs(mAvg - rAvg) < 1e-9,
        s"index final: corpus scalars diverge (maintained $mN/$mAvg vs rebuilt $rN/$rAvg)")
      val versions = lake.history.select("version")
        .collect().map(_.getLong(0)).sorted
      require(versions.sameElements(versions.indices.map(_.toLong)),
        s"index final: version holes: ${versions.mkString(",")}")
      return df.select("doc_id").distinct().count().toInt
    }
    if (mode != "upsert") {
      val nb = df.select("batch").distinct().count()
      require(nb == nBatches, s"$mode final: $nb batches, expected $nBatches")
      require(df.count() == nBatches.toLong * KillProbeWriterMain.RowsPerBatch,
        s"$mode final: row count off")
    } else {
      val expectedIds = KillProbeWriterMain.upsertKeySpan(nBatches) + 1 // + seed
      require(df.count() == expectedIds,
        s"upsert final: ${df.count()} ids, expected $expectedIds")
      // after the full uninterrupted replay, every key's value IS the
      // max batch covering it — the strong consistency the mid-kill
      // audit cannot demand of an in-flight replay
      val wrong = df.where(col("id") >= 0).where(col("batch") =!=
        KillProbeWriterMain.expectedUpsertBatchCol(nBatches - 1L)).count()
      require(wrong == 0,
        s"upsert final: $wrong ids diverge from the replayed value")
      // change feed folds to the table state: last non-preimage change
      // per key == live row (delete would win as absence; none here).
      // The seed row predates the feed, so it is excluded from both sides
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("_commit_version").desc)
      val folded = lake.readChanges(0L)
        .where(col("_change_type") =!= "update_preimage")
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .where(col("_change_type") =!= "delete")
        .select("id", "batch")
      val live = df.where(col("id") >= 0).select("id", "batch")
      val diverged = folded.exceptAll(live).count() + live.exceptAll(folded).count()
      require(diverged == 0,
        s"upsert final: change-feed fold diverges from table state on $diverged rows")
    }
    // versions contiguous (recovery commits included)
    val versions = lake.history.select("version")
      .collect().map(_.getLong(0)).sorted
    require(versions.sameElements(versions.indices.map(_.toLong)),
      s"$mode final: version holes: ${versions.mkString(",")}")
    // zero debris after the FULL reclaim: marked stages were completed
    // agelessly; UNMARKED part-stages (a kill during the staged parquet
    // write) are retained by the age horizon to protect live writers —
    // no writer is live here, so dial the horizon to zero and assert the
    // reclaim leaves nothing
    val savedRetention = LakeTable.PartStageRetentionMs
    LakeTable.PartStageRetentionMs = 0L
    try lake.vacuumDebris(): Unit
    finally LakeTable.PartStageRetentionMs = savedRetention
    val fs = fsFor(spark, table)
    val parent = new org.apache.hadoop.fs.Path(table).getParent
    val tName = new org.apache.hadoop.fs.Path(table).getName
    val debris = fs.listStatus(parent).map(_.getPath.getName)
      .filter(_ != tName)
      .filter(n => n.startsWith(tName + LakeTable.StageSuffix) ||
        n.startsWith(tName + LakeTable.StageClaimSuffix) ||
        n.startsWith(tName + LakeTable.PartStageSuffix))
    require(debris.isEmpty,
      s"$mode final: stage debris survived a zero-horizon vacuum: ${debris.mkString(",")}")
    df.select("batch").distinct().count().toInt
  }
}

/** Child JVM the probe forks and kills. Args:
  * table mode nBatches appId startedFlag outFile
  */
object KillProbeWriterMain {

  /** Rows per append batch — 3 task files each (repartition(3)), so a
    * kill mid-promotion leaves an OBSERVABLE partial batch unless the
    * append protocol makes promotion recoverable.
    */
  val RowsPerBatch = 120

  /** Upsert batches touch 75 keys starting at b*50 — 25 overlap with the
    * previous batch (updates) + 50 fresh (inserts).
    */
  val UpsertStride = 50
  val UpsertSpan = 75

  /** Total distinct keys after batches 0..n-1. */
  def upsertKeySpan(n: Int): Long =
    if (n <= 0) 0L else (n - 1).toLong * UpsertStride + UpsertSpan

  /** For the audit: the batch an id's row must carry if batches 0..maxB
    * were applied in order = the max b <= maxB with
    * b*stride <= id < b*stride + span.
    */
  def expectedUpsertBatchCol(maxB: Long): org.apache.spark.sql.Column =
    least(floor(col("id") / UpsertStride), lit(maxB))

  def main(args: Array[String]): Unit = {
    val Array(table, mode, nBatchesS, appId, startedFlag, outFile) = args
    val nBatches = nBatchesS.toInt
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val lake = LakeTable(spark, table)
    Files.write(Paths.get(startedFlag), "up".getBytes(StandardCharsets.UTF_8)): Unit
    var applied = 0
    (0 until nBatches).foreach { b =>
      mode match {
        case "sink" | "sinkcompact" =>
          val batch = (0 until RowsPerBatch)
            .map(i => (b * 10000L + i, b.toLong, s"payload-$b-$i"))
            .toDF("id", "batch", "payload").repartition(3)
          LakeSink.writeBatch(lake, batch, b.toLong, appId)
          if (mode == "sinkcompact" && b % 3 == 2)
            lake.compactSmall(minFileBytes = 1L << 30,
              targetFileBytes = 1L << 30): Unit
        case "upsert" =>
          val batch = (0 until UpsertSpan)
            .map(i => (b.toLong * UpsertStride + i, b.toLong, s"v$b-$i"))
            .toDF("id", "batch", "payload")
          lake.upsert(batch, Seq("id"), changeFeed = true): Unit
        case "index" =>
          // REAL maintenance topology: the corpus only moves FORWARD (a
          // restarted producer never re-writes old ids — re-upserting
          // them would hide fold bugs, since doc_id-keyed removals
          // self-heal duplicates). 20 fresh inserts (the pure-append
          // fold path, where a non-idempotent refold duplicates) + 10
          // updates of the current tail (the removal+re-add path).
          val idxDir = new org.apache.hadoop.fs.Path(table)
            .getParent.toString + "/idx"
          val idBase = lake.read
            .agg(max(col("doc_id"))).head().getLong(0) + 1L
          val batch = ((0 until 20).map { i =>
            val id = idBase + i
            (id, s"doc $id tok${id % 7} tok${(id + b) % 11} b$b")
          } ++ (1 to 10).map { i =>
            val id = idBase - i
            (id, s"doc $id tok${id % 7} upd$b")
          }).toDF("doc_id", "text")
          var done = false; var tries = 0
          while (!done && tries < 100) {
            try {
              lake.upsert(batch, Seq("doc_id"), changeFeed = true): Unit
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                tries += 1; Thread.sleep(100)
              case e: Exception if LakeTable.isTornRead(e) =>
                tries += 1; Thread.sleep(100)
            }
          }
          require(done, s"index doc upsert starved after $tries refusals")
          // the fold under test: the at-least-once client retries torn
          // reads exactly like the maintenance stream does
          LakeTable.retryTornRead("kill-probe index fold") {
            graft.text.InvertedIndex.applyChanges(lake, "doc_id", "text", idxDir)
          }
      }
      applied += 1
    }
    Files.write(Paths.get(outFile),
      s"""{"applied":$applied}""".getBytes(StandardCharsets.UTF_8)): Unit
    spark.stop()
  }
}
