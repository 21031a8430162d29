package graft.sources

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Object-store EMULATION over local disk, with S3-class semantics:
  *
  *   - `getScheme` reports `s3a`, so [[LakeIo.isObjectStore]] detection
  *     fires exactly as it would against a real bucket;
  *   - `rename` is CLIENT-SIDE COPY + DELETE — never atomic, never
  *     refuses an existing destination (it clobbers, like S3 CopyObject)
  *     — each copied file and each delete is a separate [[FsFuse]]
  *     mutation, so a crash leaves src+dst mixtures a POSIX rename
  *     cannot produce;
  *   - `create` buffers and materializes the object ATOMICALLY AT CLOSE
  *     (whole-object PUT): a crash before close leaves NOTHING, and
  *     partial content is never visible — the one honest guarantee
  *     object stores do give.
  *
  * The spec walks the lake's claim/swap/publish protocol under this fs
  * (the CrashInjectionSpec fuse pattern) in the opt-in SingleWriter
  * mode, and pins the default: with no opt-in, lake writes REFUSE the
  * substrate with an error naming the missing contract.
  */
final class ObjectStoreEmulFs extends RawLocalFileSystem {
  override def getScheme: String = "s3a"

  private def copyFile(src: Path, dst: Path): Unit = {
    val in = super.open(src, 4096)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    // route through create(): the copy is itself a PUT — one mutation,
    // visible whole at close, clobbering any existing dst (S3 CopyObject)
    val out = create(dst, FsPermission.getFileDefault, true, 4096,
      1.toShort, 33554432L, null)
    try out.write(bytes)
    finally out.close()
  }

  private def copyRec(src: Path, dst: Path): Unit = {
    val st = super.getFileStatus(src)
    if (st.isDirectory) {
      super.listStatus(src).foreach(c => copyRec(c.getPath, new Path(dst, c.getPath.getName)))
    } else copyFile(src, dst)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FsFuse.read()
    if (!super.exists(src)) return false
    // honest S3A semantics: rename REFUSES an existing destination FILE
    // (S3AFileSystem checks dest and returns false before any copy) —
    // a crashed previous rename that completed its copy but not its
    // source delete leaves src+dst BOTH present, and the retry gets
    // `false`, not a silent re-copy. Recovery code must handle that
    // state explicitly (promoteFile's completed-copy tolerance).
    if (super.exists(dst) && super.getFileStatus(dst).isFile) return false
    copyRec(src, dst)
    FsFuse.mutation()
    super.delete(src, true)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    FsFuse.mutation(); super.delete(p, recursive)
  }
  // object stores have no directories — mkdirs is free and unfailing
  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    FsFuse.read(); super.mkdirs(p, permission)
  }
  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    FsFuse.read() // opening an upload is not yet a visible mutation
    val buf = new java.io.ByteArrayOutputStream()
    val self = this
    val stream = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        // the PUT: one mutation, visible whole or not at all
        FsFuse.mutation()
        val out = self.rawCreate(f, permission, overwrite, bufferSize,
          replication, blockSize, progress)
        try out.write(buf.toByteArray)
        finally out.close()
      }
    }
    new FSDataOutputStream(stream, null)
  }
  private def rawCreate(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    FsFuse.read(); super.open(f, bufferSize)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    FsFuse.read(); super.listStatus(f)
  }
  override def getFileStatus(f: Path): FileStatus = {
    FsFuse.read(); super.getFileStatus(f)
  }
  override def mkdirs(p: Path): Boolean = { FsFuse.read(); super.mkdirs(p) }
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

  test("Coordinated: claims route through the external coordinator") {
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val coord = new LakeIo.ClaimCoordinator {
      def claim(key: String): Boolean = claimed.add(key)
    }
    withObjectStore(LakeIo.Coordinated(coord)) {
      val dir = Files.createTempDirectory("graft_os_coord").toString + "/t"
      val lake = LakeTable(spark, dir)
      lake.write(Seq((1L, "a")).toDF("id", "v").coalesce(1))
      lake.write(Seq((2L, "b")).toDF("id", "v").coalesce(1), SaveMode.Append)
      assert(rows(dir) === Seq((1L, "a"), (2L, "b")))
      assert(!claimed.isEmpty, "no claim ever reached the coordinator")
      // a coordinator refusing every claim surfaces as a clean conflict
      val never = new LakeIo.ClaimCoordinator { def claim(key: String) = false }
      LakeIo.objectStoreMode = LakeIo.Coordinated(never)
      intercept[Exception] {
        lake.write(Seq((3L, "c")).toDF("id", "v").coalesce(1), SaveMode.Append)
      }
    }
  }

  /** CrashInjectionSpec's fuse walk, under the object-store fs: template
    * table of 2 rows, op crashed at every mutation, vacuumDebris + the
    * pre-or-post + commit-never-lies contract, then a follow-up append.
    */
  private def objectStoreCrashWalk(
      name: String, op: LakeTable => Unit, post: Seq[(Long, String)]): Unit =
    withObjectStore(LakeIo.SingleWriter) {
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
}
