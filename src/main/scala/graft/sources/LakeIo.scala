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

  // one FileContext per (scheme, authority): getFileContext builds a
  // fresh AbstractFileSystem via reflection on EVERY call, which at one
  // publish per commit turned into a measurable per-commit tax (the
  // r13 bench flagged every commit-heavy lake query ~1.5x). FileContext
  // is thread-safe as used here (no umask/working-dir mutation).
  private val fileContexts =
    new java.util.concurrent.ConcurrentHashMap[String, FileContext]()

  private def contextFor(fs: FileSystem, path: Path): FileContext = {
    val uri = fs.makeQualified(path).toUri
    val key = uri.getScheme + "://" + Option(uri.getAuthority).getOrElse("")
    fileContexts.computeIfAbsent(key,
      _ => FileContext.getFileContext(uri, fs.getConf))
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
        contextFor(fs, path).rename(
          fs.makeQualified(tmp), fs.makeQualified(path),
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

  // in-JVM serialization per destination: the local ChecksumFs renames
  // the data file and its .crc sidecar as TWO unguarded ops (data
  // clobbers via POSIX rename when both racers pass the layered
  // dst-exists checks; the crc rename then crosses), so two same-JVM
  // racers could publish A's bytes under B's checksum. One lock per
  // path keeps the loser behind the winner's completed pair. Across
  // PROCESSES the contract is the filesystem's: HDFS rename is
  // server-side atomic (this is Delta's HDFS LogStore protocol);
  // multi-process writers against one checksummed LOCAL directory were
  // never a supported topology.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Read a metadata file published through [[atomicOverwrite]],
    * absorbing the transient artifacts a concurrent republish can show
    * a reader on checksummed local filesystems: a brief absence (the
    * OVERWRITE rename degrades to delete+rename there) and a brief
    * data/.crc mismatch (the pair moves as two ops). Both resolve on a
    * re-read because the writer's content is always a complete file;
    * after `attempts` the error is real and surfaces. None = the file
    * durably does not exist.
    */
  def resilientRead(fs: FileSystem, path: Path, attempts: Int = 8): Option[String] = {
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(path)) {
          // absence may be the rename window, not a missing file —
          // confirm it holds across one backoff before believing it
          if (attempt >= 2) return None
        } else {
          val in = fs.open(path)
          try return Some(new String(
            org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
          finally in.close()
        }
      } catch {
        case e @ (_: java.io.FileNotFoundException |
            _: org.apache.hadoop.fs.ChecksumException) =>
          if (attempt >= attempts) throw e
      }
      attempt += 1
      Thread.sleep(25L * attempt)
    }
    None // unreachable
  }

  /** Publish `text` at `path` iff nothing is there — the atomic claim
    * a commit record needs. Returns false (and cleans its tmp) when a
    * concurrent writer won the name.
    */
  def renamePublish(fs: FileSystem, path: Path, text: String): Boolean =
    publishLocks.computeIfAbsent(
      fs.makeQualified(path).toString, _ => new Object).synchronized {
      if (fs.exists(path)) return false
      val tmp = writeTmp(fs, path, text)
      try {
        contextFor(fs, path).rename(fs.makeQualified(tmp), fs.makeQualified(path))
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
