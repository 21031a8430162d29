package graft.sources

import java.net.URI
import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Object-store EMULATION: [[S3SimFs]]'s honest S3-class semantics
  * (PUT-at-close create, copy+delete rename that refuses an existing
  * destination) with the crash fuse wired into the read/mutation seams.
  *
  * The spec walks the lake's claim/swap/publish protocol under this fs
  * (the CrashInjectionSpec fuse pattern) in the opt-in SingleWriter and
  * Coordinated modes, and pins the default: with no opt-in, lake writes
  * REFUSE the substrate with an error naming the missing contract.
  */
final class ObjectStoreEmulFs extends S3SimFs {
  override protected def onRead(): Unit = FsFuse.read()
  override protected def onMutation(): Unit = FsFuse.mutation()
}

class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newObjectFs(): ObjectStoreEmulFs = {
    val fs = new ObjectStoreEmulFs()
    fs.initialize(URI.create("file:///"), spark.sessionState.newHadoopConf())
    fs
  }

  private def withObjectStore[T](mode: LakeIo.ObjectStoreMode)(body: => T): T = {
    LakeTable.fsDecoratorForTest = _ => newObjectFs()
    LakeIo.objectStoreMode = mode
    FsFuse.disarm()
    try body
    finally {
      LakeTable.fsDecoratorForTest = identity(_)
      LakeIo.objectStoreMode = LakeIo.Refuse
      FsFuse.disarm()
    }
  }

  private def rows(dir: String): Seq[(Long, String)] =
    LakeTable(spark, dir).read.select(col("id"), col("v"))
      .as[(Long, String)].collect().sorted.toSeq

  test("default: lake writes on an object-store scheme REFUSE, naming the contract") {
    withObjectStore(LakeIo.Refuse) {
      val dir = Files.createTempDirectory("graft_os_refuse").toString + "/t"
      val e = intercept[IllegalStateException] {
        LakeTable(spark, dir).write(Seq((1L, "a")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("object store"), e.getMessage)
      assert(e.getMessage.contains("atomic rename"), e.getMessage)
      assert(e.getMessage.contains("SingleWriter"), e.getMessage)
      // reads of plain parquet are NOT refused (consuming a bucket is fine)
      assert(!new java.io.File(dir).exists(), "refusal must precede any write")
    }
  }

  test("SingleWriter: write/append/upsert/delete round-trip under PUT+copy-delete semantics") {
    withObjectStore(LakeIo.SingleWriter) {
      val dir = Files.createTempDirectory("graft_os_rt").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
      lake.write(Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append)
      lake.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"), Seq("id"))
      lake.delete(col("id") === 1L)
      assert(rows(dir) === Seq((2L, "B"), (3L, "c"), (4L, "d")))
      assert(lake.history.count() >= 4)
      lake.vacuumDebris(): Unit
      assert(rows(dir) === Seq((2L, "B"), (3L, "c"), (4L, "d")))
    }
  }

  test("SingleWriter: in-process claim race has exactly one winner per version") {
    withObjectStore(LakeIo.SingleWriter) {
      val dir = Files.createTempDirectory("graft_os_race").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((0L, "z")).toDF("id", "v").coalesce(1))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val tasks = (1 to 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean =
              try {
                LakeTable(spark, dir).write(
                  Seq((i.toLong, "w")).toDF("id", "v").coalesce(1), SaveMode.Append)
                true
              } catch { case _: java.util.ConcurrentModificationException => false }
          })
        }
        val ok = tasks.map(_.get()).count(identity)
        assert(ok === 8, "appends are non-conflicting and should all land")
      } finally pool.shutdown()
      assert(rows(dir).length === 9)
      // one commit record per version — no clobbered claims
      val versions = LakeTable(spark, dir).history
        .select("version").as[Long].collect().toSeq
      assert(versions.distinct.length === versions.length,
        s"duplicate commit versions: $versions")
    }
  }

  test("SingleWriter: append converges from a crash at every object-store mutation") {
    objectStoreCrashWalk("append",
      l => l.write(Seq((10L, "x"), (11L, "x")).toDF("id", "v").coalesce(1),
        SaveMode.Append): Unit,
      post = Seq((0L, "a"), (1L, "a"), (10L, "x"), (11L, "x")))
  }

  test("SingleWriter: staged-swap upsert converges from a crash at every object-store mutation") {
    objectStoreCrashWalk("upsert",
      l => l.upsert(Seq((1L, "u"), (5L, "n")).toDF("id", "v"), Seq("id")): Unit,
      post = Seq((0L, "a"), (1L, "u"), (5L, "n")))
  }

  test("SingleWriter: standing BM25 index builds, folds, and serves on the emulated store") {
    // BASELINE claims the index-maintenance invariants (in-row fold
    // watermark, value-idempotent vocabulary) survive a non-atomic-
    // rename substrate given the SingleWriter claim — prove the whole
    // lifecycle under PUT+copy-delete semantics
    import graft.text.InvertedIndex
    withObjectStore(LakeIo.SingleWriter) {
      val root = Files.createTempDirectory("graft_os_idx").toString
      val base = LakeTable(spark, s"$root/docs").write(Seq(
        (1L, "apple banana apple"), (2L, "banana cherry"),
        (3L, "cherry apple")).toDF("doc_id", "text"))
      val dir = s"$root/idx"
      InvertedIndex.build(base, "doc_id", "text", dir)
      base.upsert(Seq((2L, "durian fig"), (4L, "grape apple"))
        .toDF("doc_id", "text"), Seq("doc_id"), changeFeed = true)
      InvertedIndex.applyChanges(base, "doc_id", "text", dir)
      val rebuilt = s"$root/idx2"
      InvertedIndex.build(base, "doc_id", "text", rebuilt)
      def served(d: String) = InvertedIndex.serveBm25(spark, d,
        Seq(1L -> "apple", 2L -> "durian", 3L -> "grape"), k = 10,
        InvertedIndex.DefaultK1, InvertedIndex.DefaultB)
        .collect().map(_.toString).sorted.toSeq
      assert(served(dir) === served(rebuilt),
        "fold on the emulated object store diverged from a rebuild")
    }
  }

  test("SingleWriter: a second process attaching the same table is refused loudly") {
    withObjectStore(LakeIo.SingleWriter) {
      val dir = Files.createTempDirectory("graft_os_owner").toString + "/t"
      LakeTable(spark, dir).write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      // impersonate a fresh process: distinct nonce, cold heartbeat cache
      LakeIo.processNonceForTest = Some("second-process-nonce")
      LakeIo.resetOwnershipForTest()
      try {
        val e = intercept[IllegalStateException] {
          LakeTable(spark, dir).write(
            Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append)
        }
        assert(e.getMessage.contains("ONE writer process"), e.getMessage)
        assert(e.getMessage.contains("Coordinated"), e.getMessage)
      } finally {
        LakeIo.processNonceForTest = None
        LakeIo.resetOwnershipForTest()
      }
      // the refusal fired at ENTRY: the second process staged nothing for
      // recovery to mis-attribute later, and the owner continues unharmed
      LakeTable(spark, dir).write(
        Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
      assert(rows(dir) === Seq((1L, "a"), (3L, "c")))
    }
  }

  test("SingleWriter: a dead owner's stale stamp is reclaimed past the ttl") {
    withObjectStore(LakeIo.SingleWriter) {
      val dir = Files.createTempDirectory("graft_os_stale").toString + "/t"
      LakeTable(spark, dir).write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      val oldTtl = LakeIo.singleWriterStampTtlMs
      // the owner "dies"; its heartbeat goes stale past the (shortened) ttl
      LakeIo.singleWriterStampTtlMs = 50L
      LakeIo.processNonceForTest = Some("successor-process-nonce")
      LakeIo.resetOwnershipForTest()
      Thread.sleep(150L)
      try {
        LakeTable(spark, dir).write(
          Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
        assert(rows(dir) === Seq((1L, "a"), (2L, "b")),
          "stale-stamp takeover did not land the successor's write")
      } finally {
        LakeIo.singleWriterStampTtlMs = oldTtl
        LakeIo.processNonceForTest = None
        LakeIo.resetOwnershipForTest()
      }
    }
  }

  test("Coordinated: claims route through the external coordinator") {
    val claimed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val coord = new LakeIo.ClaimCoordinator {
      def claim(key: String, stagedRef: String): Boolean =
        claimed.putIfAbsent(key, stagedRef) == null
      def claimedRef(key: String): Option[String] = Option(claimed.get(key))
    }
    withObjectStore(LakeIo.Coordinated(coord)) {
      val dir = Files.createTempDirectory("graft_os_coord").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      lake.write(Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append)
      assert(rows(dir) === Seq((1L, "a"), (2L, "b")))
      assert(!claimed.isEmpty, "no claim ever reached the coordinator")
      // a coordinator refusing every claim surfaces as a clean conflict
      val never = new LakeIo.ClaimCoordinator {
        def claim(key: String, stagedRef: String) = false
        def claimedRef(key: String): Option[String] = None
      }
      LakeIo.objectStoreMode = LakeIo.Coordinated(never)
      intercept[Exception] {
        lake.write(Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append)
      }
    }
  }

  test("Coordinated: a winner crashing between claim and PUT does not wedge the table") {
    // the r15 ADVICE wedge: claim(v) consumed, v.json never PUT —
    // nextVersion stalls at v, every writer "loses" the race forever.
    // Recovery: content stages BEFORE the claim, and a loser completes
    // the winner's publication from the claim's stagedRef.
    val inner = new FileClaimCoordinator(
      Files.createTempDirectory("graft_os_coorddir").toString)
    @volatile var crashArmed = false
    @volatile var crashed = false
    val coord = new LakeIo.ClaimCoordinator {
      def claim(key: String, stagedRef: String): Boolean = {
        val won = inner.claim(key, stagedRef)
        if (won && crashArmed && !crashed) {
          crashed = true
          throw new RuntimeException(
            "simulated crash: claim recorded, PUT never made")
        }
        won
      }
      def claimedRef(key: String): Option[String] = inner.claimedRef(key)
    }
    withObjectStore(LakeIo.Coordinated(coord)) {
      val dir = Files.createTempDirectory("graft_os_wedge").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      crashArmed = true
      // writer 1 dies after winning the claim for its commit version
      intercept[RuntimeException] {
        lake.write(Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append)
      }
      assert(crashed, "simulated crash never fired")
      crashArmed = false
      // writer 2 must NOT wedge: its lost claim completes the crashed
      // winner's publication and moves on to the next version
      LakeTable(spark, dir).write(
        Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
      // writer 1's data was promoted pre-commit and its recovered commit
      // record attributes it — all three rows, exactly once
      LakeTable(spark, dir).vacuumDebris(): Unit
      assert(rows(dir) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
      val versions = LakeTable(spark, dir).history
        .select("version").as[Long].collect().toSeq
      assert(versions.distinct.length === versions.length,
        s"duplicate commit versions: $versions")
    }
  }

  test("Coordinated: append converges from a crash at every object-store mutation") {
    // the SingleWriter fuse walk, under Coordinated through a real
    // file-backed coordinator — crashes land between content staging,
    // claim, and PUT (the multi-writer mode's own windows)
    val coord = new FileClaimCoordinator(
      Files.createTempDirectory("graft_os_coordwalk").toString)
    objectStoreCrashWalk("coord_append",
      l => l.write(Seq((10L, "x"), (11L, "x")).toDF("id", "v").coalesce(1),
        SaveMode.Append): Unit,
      post = Seq((0L, "a"), (1L, "a"), (10L, "x"), (11L, "x")),
      mode = LakeIo.Coordinated(coord))
  }

  /** CrashInjectionSpec's fuse walk, under the object-store fs: template
    * table of 2 rows, op crashed at every mutation, vacuumDebris + the
    * pre-or-post + commit-never-lies contract, then a follow-up append.
    */
  private def objectStoreCrashWalk(
      name: String, op: LakeTable => Unit, post: Seq[(Long, String)],
      mode: LakeIo.ObjectStoreMode = LakeIo.SingleWriter): Unit =
    withObjectStore(mode) {
      val maxFuse = 200
      val pre = Seq((0L, "a"), (1L, "a"))
      var fuse = 0
      var completed = false
      var crashes = 0
      while (!completed && fuse < maxFuse) {
        val dir = Files.createTempDirectory(s"graft_os_crash_$name").toString + "/t"
        FsFuse.disarm()
        LakeTable(spark, dir).write(pre.toDF("id", "v").coalesce(1))
        val preCommits = LakeTable(spark, dir).history.count()
        FsFuse.arm(fuse)
        val outcome = try { op(LakeTable(spark, dir)); None }
        catch { case t: Throwable => Some(t) }
        val fired = FsFuse.fired
        FsFuse.disarm()
        if (outcome.isEmpty && !fired) completed = true
        else {
          assert(fired, s"$name fuse=$fuse: failed without the fuse firing: ${outcome.get}")
          crashes += 1
          val fresh = LakeTable(spark, dir)
          fresh.vacuumDebris(): Unit
          val got = rows(dir)
          assert(got == pre || got == post,
            s"$name fuse=$fuse: recovered state is neither pre nor post: $got")
          val opsAfter = fresh.history
            .select("version", "operation").as[(Long, String)].collect()
            .filter(r => r._1 >= preCommits && r._2 != "VACUUM DEBRIS")
          if (opsAfter.nonEmpty)
            assert(got == post,
              s"$name fuse=$fuse: commit recorded (${opsAfter.mkString(",")}) but data is pre")
          LakeTable(spark, dir).write(
            Seq((999L, "z")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
          assert(rows(dir) == (got :+ (999L -> "z")).sorted,
            s"$name fuse=$fuse: follow-up append broke the table")
        }
        fuse += 1
      }
      assert(completed, s"$name: still crashing after $maxFuse fuse positions")
      assert(crashes >= 3, s"$name walk exercised only $crashes crash points")
    }

  test("Coordinated: staged rewrites release the slot claim — later rewrites proceed") {
    // the stage claim is a claim-RELEASE slot, not a publish-once key:
    // without coordinator.release on releaseStage, rewrite 2's claim
    // loses forever against rewrite 1's retained record (object deleted,
    // staged ref long gone) and the table can never rewrite again
    val coordDir = Files.createTempDirectory("graft_os_slot").toString
    val coord = new FileClaimCoordinator(coordDir)
    withObjectStore(LakeIo.Coordinated(coord)) {
      val dir = Files.createTempDirectory("graft_os_slot_t").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((0L, "a"), (1L, "a")).toDF("id", "v").coalesce(1))
      lake.upsert(Seq((1L, "U1")).toDF("id", "v"), Seq("id"))
      lake.upsert(Seq((0L, "U2"), (5L, "n")).toDF("id", "v"), Seq("id"))
      LakeTable(spark, dir).delete(col("id") === 5L)
      assert(rows(dir) === Seq((0L, "U2"), (1L, "U1")))
    }
  }

  test("Coordinated: completed claim records expire; crashed-winner claims survive") {
    val coordDir = Files.createTempDirectory("graft_os_expire").toString
    val coord = new FileClaimCoordinator(coordDir)
    withObjectStore(LakeIo.Coordinated(coord)) {
      val dir = Files.createTempDirectory("graft_os_expire_t").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      lake.write(Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append)
      val claimFiles = () => Option(new java.io.File(coordDir).listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith("claim_"))
      val before = claimFiles()
      assert(before >= 2, s"expected one claim record per commit, got $before")
      // a crashed winner: claim held, object never PUT — the recovery
      // pointer expire() must never reclaim
      val fs = newObjectFs()
      val phantom = new org.apache.hadoop.fs.Path(dir, "_graft_log/99999.json")
      assert(coord.claim(fs.makeQualified(phantom).toString, "stale-ref"))
      val exists: String => Boolean =
        key => fs.exists(new org.apache.hadoop.fs.Path(new URI(key)))
      val reclaimed = coord.expire(0L, exists)
      assert(reclaimed === before,
        s"expire reclaimed $reclaimed of $before completed claims")
      assert(claimFiles() === 1, "the crashed-winner claim must survive")
      assert(coord.claimedRef(fs.makeQualified(phantom).toString)
        .contains("stale-ref"), "surviving claim lost its recovery pointer")
      // expiry is safe because a completed version is never re-claimed:
      // publishing to an existing path answers false WITHOUT touching
      // the coordinator (the exists-precheck)
      val v0 = new org.apache.hadoop.fs.Path(dir,
        "_graft_log/" + "0" * 20 + ".json")
      assert(fs.exists(v0), "expected version 0 commit record")
      val countBefore = claimFiles()
      assert(!LakeIo.renamePublish(fs, v0, "interloper"),
        "republish of an existing version must lose")
      assert(claimFiles() === countBefore,
        "a lost republish must not create a new claim record")
      // and the table keeps committing normally after expiry
      LakeTable(spark, dir).write(
        Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append): Unit
      assert(rows(dir) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    }
  }

  test("Coordinated: checkpoint-folded commit claims still expire (completedOn)") {
    // a bare existence predicate under-reclaims: checkpoints fold
    // per-commit files away, so every folded commit's claim would read
    // as a crashed winner and be kept forever — unbounded growth again.
    // completedOn adds the density argument: any LATER version existing
    // proves this one landed.
    val coordDir = Files.createTempDirectory("graft_os_cpexp").toString
    val coord = new FileClaimCoordinator(coordDir)
    withObjectStore(LakeIo.Coordinated(coord)) {
      val fs = newObjectFs()
      val logDir = new org.apache.hadoop.fs.Path(
        Files.createTempDirectory("graft_os_cpexp_log").toString, "_graft_log")
      def rec(v: Long) = new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json")
      (0L to 2L).foreach(v =>
        assert(LakeIo.renamePublish(fs, rec(v), s"""{"version":$v}""")))
      // checkpoint fold: versions 0..1 deleted, covered by 1.checkpoint
      LakeIo.atomicOverwrite(fs,
        new org.apache.hadoop.fs.Path(logDir, f"${1L}%020d.checkpoint"), "folded")
      fs.delete(rec(0L), false): Unit
      fs.delete(rec(1L), false): Unit
      val completed = FileClaimCoordinator.completedOn(fs)
      assert(!fs.exists(rec(0L)) && completed(fs.makeQualified(rec(0L)).toString),
        "a folded commit's claim must read as completed")
      assert(completed(fs.makeQualified(rec(1L)).toString))
      assert(completed(fs.makeQualified(rec(2L)).toString))
      // the true crashed winner sits at head+1 and stays protected
      assert(coord.claim(fs.makeQualified(rec(3L)).toString, "stale-ref"))
      assert(!completed(fs.makeQualified(rec(3L)).toString))
      val reclaimed = coord.expire(0L, completed)
      assert(reclaimed === 3, s"expected 3 folded/present claims reclaimed, got $reclaimed")
      val left = Option(new java.io.File(coordDir).listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith("claim_"))
      assert(left === 1, "only the crashed-winner claim may survive")
    }
  }
}
