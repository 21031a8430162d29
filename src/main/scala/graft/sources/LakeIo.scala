package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Atomic publication for the lake layer's metadata files.
  *
  * A metadata file written with `create(path)` is VISIBLE (exists,
  * zero bytes) before its content lands, so any concurrent reader —
  * a log scan, a schema load, an index-freshness check — can catch a
  * torn read ("no content to map" from an empty commit record was the
  * witnessed failure, killing a live maintenance stream mid-poll).
  * Every publication therefore goes content-first: bytes land under a
  * dot-prefixed tmp sibling no glob or listing matches, and ONE rename
  * publishes the finished file. Two flavors:
  *   - [[atomicOverwrite]] — replace-or-create (schema, stamps,
  *     watermarks, constraints): rename with OVERWRITE, one metadata
  *     op, a reader sees the old content or the new, never neither;
  *   - [[renamePublish]] — first-writer-wins (commit records): the
  *     rename REFUSES an existing destination, preserving the
  *     optimistic-concurrency semantics `create(path, false)` gave,
  *     without its torn window. (In-JVM writers are additionally
  *     serialized by CommitLog's per-table lock; the cross-process
  *     check-then-rename window is the same one every HDFS-rename
  *     commit protocol carries.)
  */
object LakeIo {

  private def tmpSibling(path: Path): Path =
    new Path(path.getParent,
      s".tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}")

  /** Dot-prefixed tmp names this module writes — vacuum sweeps match
    * on it to reclaim crash debris.
    */
  val TmpPrefix = ".tmp_"

  private def writeTmp(fs: FileSystem, path: Path, text: String): Path = {
    val tmp = tmpSibling(path)
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  /** Publish `text` at `path`, atomically replacing any previous
    * content. On bindings whose OVERWRITE rename is itself
    * delete-then-rename (local ChecksumFs), two CONCURRENT overwriters
    * can collide — one's rename lands inside the other's window and the
    * loser sees FileAlreadyExists; retrying re-runs the whole
    * delete+rename and converges (last writer wins, both contents were
    * complete files). Filesystems without a FileContext binding fall
    * back to an explicit delete+rename — the narrowest window they can
    * express.
    */
  def atomicOverwrite(fs: FileSystem, path: Path, text: String): Unit = {
    val tmp = writeTmp(fs, path, text)
    var attempt = 0
    while (true) {
      try {
        val fc = FileContext.getFileContext(
          fs.makeQualified(path).toUri, fs.getConf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(path),
          Options.Rename.OVERWRITE)
        return
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException if attempt < 8 =>
          attempt += 1
          Thread.sleep(10L * attempt)
        case _: UnsupportedOperationException |
            _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (fs.exists(path)) fs.delete(path, false): Unit
          if (!fs.rename(tmp, path))
            throw new java.io.IOException(
              s"could not publish $path: rename $tmp -> $path failed")
          return
      }
    }
  }

  /** Publish `text` at `path` iff nothing is there — the atomic claim
    * a commit record needs. Returns false (and cleans its tmp) when a
    * concurrent writer won the name.
    */
  def renamePublish(fs: FileSystem, path: Path, text: String): Boolean = {
    if (fs.exists(path)) return false
    val tmp = writeTmp(fs, path, text)
    try {
      val fc = FileContext.getFileContext(
        fs.makeQualified(path).toUri, fs.getConf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(path))
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false): Unit
        false
      case _: UnsupportedOperationException |
          _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // FileSystem.rename refuses an existing file destination on
        // every binding we reach this from
        val ok = fs.rename(tmp, path)
        if (!ok) fs.delete(tmp, false): Unit
        ok
    }
  }
}
