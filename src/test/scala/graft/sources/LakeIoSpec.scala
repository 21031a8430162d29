package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec

/** The metadata-publication contract: a file published through LakeIo is
  * COMPLETE whenever it is visible — no reader ever observes the
  * exists-but-empty window a bare create-then-write leaves (the window
  * that killed a live maintenance stream parsing a zero-byte commit
  * record).
  */
class LakeIoSpec extends SparkSpec {

  private def tmpDir = Files.createTempDirectory("graft_lakeio").toString

  private def hfs(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readAll(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  test("atomicOverwrite: a hammering reader sees complete old or new content, never torn") {
    val dir = tmpDir
    val fs = hfs(dir)
    val target = new Path(dir, "_meta")
    // contents are self-describing (value repeated) so a torn read is
    // detectable as an internal inconsistency, not just emptiness
    def content(i: Int) = s"$i\n$i\n$i"
    LakeIo.atomicOverwrite(fs, target, content(0))
    val torn = new AtomicInteger
    val writer = Future {
      (1 to 200).foreach(i => LakeIo.atomicOverwrite(fs, target, content(i)))
    }
    val reader = Future {
      var last = -1
      while (!writer.isCompleted) {
        // the local ChecksumFs OVERWRITE degrades to delete+rename, so a
        // brief absence is allowed — but visible content must be whole
        // and versions must never run backwards
        if (fs.exists(target)) {
          // transient absences AND transient checksum mismatches are the
          // local ChecksumFs's two-op rename showing through (data file
          // and .crc sidecar move separately) — both are the retryable
          // family retryTornRead handles for real consumers; what must
          // NEVER appear is structurally torn content or a version
          // running backwards
          val text = try Some(readAll(fs, target)) catch {
            case _: java.io.FileNotFoundException => None
            case _: org.apache.hadoop.fs.ChecksumException => None
          }
          text.foreach { t =>
            val lines = t.split('\n')
            if (lines.length != 3 || lines.distinct.length != 1) torn.incrementAndGet()
            else {
              val v = lines.head.toInt
              if (v < last) torn.incrementAndGet()
              last = v
            }
          }
        }
      }
    }
    Await.result(writer, 2.minutes)
    Await.result(reader, 2.minutes)
    assert(torn.get === 0, s"${torn.get} torn/backwards reads")
    assert(readAll(fs, target) === content(200))
  }

  test("renamePublish: first writer wins, loser's tmp is cleaned, content always whole") {
    val dir = tmpDir
    val fs = hfs(dir)
    val winners = new AtomicInteger
    (0 until 20).foreach { round =>
      val target = new Path(dir, f"$round%020d.json")
      val results = Await.result(
        Future.sequence((0 until 4).map(w => Future {
          LakeIo.renamePublish(fs, target, s"""{"writer":$w,"round":$round}""")
        })), 2.minutes)
      assert(results.count(identity) === 1,
        s"round $round: expected exactly one winner, got $results")
      winners.addAndGet(1)
      // the published content is one writer's COMPLETE record
      val text = readAll(fs, target)
      assert(text.startsWith("""{"writer":""") && text.endsWith(s""","round":$round}"""))
    }
    // no tmp debris from the losing writers
    val leftover = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith(LakeIo.TmpPrefix))
    assert(leftover.isEmpty, leftover.mkString(", "))
    assert(winners.get === 20)
  }

  test("atomicOverwrite migrates a legacy checksummed file: the stale .crc sidecar drops") {
    // pre-r13 metadata was written through the checksummed fs, so
    // existing tables carry .crc sidecars; the first raw (sidecar-free)
    // overwrite must DROP the legacy sidecar or every subsequent
    // checksummed read would fail verification against stale sums
    val dir = tmpDir
    val fs = hfs(dir) // LocalFileSystem = ChecksumFileSystem
    val target = new Path(dir, "_legacy_meta")
    val out = fs.create(target, true) // checksummed write: creates the sidecar
    try out.write("old-checksummed-content".getBytes("UTF-8"))
    finally out.close()
    val crc = fs.asInstanceOf[org.apache.hadoop.fs.ChecksumFileSystem]
      .getChecksumFile(target)
    assert(fs.asInstanceOf[org.apache.hadoop.fs.ChecksumFileSystem]
      .getRawFileSystem.exists(crc), "precondition: legacy sidecar present")
    LakeIo.atomicOverwrite(fs, target, "new-raw-content")
    assert(!fs.asInstanceOf[org.apache.hadoop.fs.ChecksumFileSystem]
      .getRawFileSystem.exists(crc), "stale sidecar must drop with the publish")
    // and the checksummed read path serves the new content unverified
    assert(readAll(fs, target) === "new-raw-content")
  }

  test("renamePublish refuses an existing destination outright") {
    val dir = tmpDir
    val fs = hfs(dir)
    val target = new Path(dir, "once")
    assert(LakeIo.renamePublish(fs, target, "first"))
    assert(!LakeIo.renamePublish(fs, target, "second"))
    assert(readAll(fs, target) === "first")
  }
}
