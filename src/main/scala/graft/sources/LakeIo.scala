package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{ChecksumFileSystem, FileContext, FileSystem, Options, Path}

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
  *     watermarks, constraints): a reader sees the old content or the
  *     new, never neither;
  *   - [[renamePublish]] — first-writer-wins (commit records): the
  *     publish REFUSES an existing destination, preserving the
  *     optimistic-concurrency semantics `create(path, false)` gave,
  *     without its torn window.
  *
  * Two filesystem regimes, because their atomic primitives differ:
  *   - LOCAL (`ChecksumFileSystem`): all ops go through the RAW
  *     filesystem — metadata files carry no `.crc` sidecar, so an
  *     overwrite is ONE POSIX rename (atomic, windowless) instead of
  *     the checksummed pair whose two-op move can cross one writer's
  *     bytes with another's checksum (hadoop 3.4.2's ChecksumFs renames
  *     data then crc WITHOUT overwrite — disassembled); readers via the
  *     checksummed fs skip verification for crc-less files, which is
  *     the standard external-file behavior. Any legacy sidecar is
  *     removed at publish so it can never go stale. Exclusive publish
  *     claims the destination with a HARD LINK — link(2) refuses an
  *     existing name atomically at the kernel — so first-writer-wins
  *     holds ACROSS PROCESSES, not just across threads of one JVM
  *     (CrossProcessProbe races two JVMs' commit claims on one table);
  *     the per-dir in-JVM lock remains as a fast-path serializer.
  *   - REMOTE (HDFS & co): FileContext rename, with and without
  *     OVERWRITE — server-side atomic, the Delta HDFS LogStore
  *     protocol. FileContexts are cached per scheme/authority
  *     (getFileContext reflects a fresh AbstractFileSystem per call — a
  *     measurable per-commit tax when uncached).
  */
object LakeIo {

  /** Dot-prefixed tmp names this module writes — vacuum sweeps match
    * on it to reclaim crash debris.
    */
  val TmpPrefix = ".tmp_"

  // ---------------------------------------------------------------- //
  // Storage-substrate honesty: the commit protocol's exclusivity      //
  // primitives (hard link / rename-refuse) DO NOT EXIST on S3-class   //
  // object stores, and running the protocol there anyway loses        //
  // commits under exactly the races the local/HDFS machinery wins.    //
  // Scheme detection below REFUSES those substrates by default; the   //
  // opt-in modes replace the claim primitive with one the substrate   //
  // can honor (the public Delta LogStore design: single-writer        //
  // in-process arbitration, or an external claim coordinator à la     //
  // the DynamoDB LogStore).                                           //
  // ---------------------------------------------------------------- //

  /** Schemes whose filesystems are object stores: no atomic rename
    * (rename is client-side copy+delete), no hard links, no
    * refuse-on-existing-destination — every primitive the claim
    * protocol leans on. Writes ARE whole-object atomic PUTs (readers
    * never observe a partial object), which is what the opt-in modes
    * build on.
    */
  private val ObjectStoreSchemes = Set(
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
    "oss", "cos", "cosn", "swift", "obs")

  /** Best-effort scheme of `fs` ([[FileSystem.getScheme]] when the
    * implementation provides it, else the instance URI's).
    */
  private def schemeOf(fs: FileSystem): String = {
    val s =
      try fs.getScheme
      catch { case _: UnsupportedOperationException => null }
    Option(s).orElse(Option(fs.getUri).flatMap(u => Option(u.getScheme)))
      .getOrElse("")
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** True iff `fs` is an S3-class object store (by scheme). */
  def isObjectStore(fs: FileSystem): Boolean =
    ObjectStoreSchemes.contains(schemeOf(fs))

  /** External first-writer-wins arbiter for object-store MULTI-writer
    * commits — the seam the public Delta S3 multi-cluster LogStore
    * fills with DynamoDB conditional writes. `claim(key)` must return
    * true for exactly one caller per key ACROSS ALL PROCESSES; the
    * winning content is then PUT at the claimed name (whole-object
    * atomic, so readers see nothing until the object is complete).
    */
  trait ClaimCoordinator {
    def claim(key: String): Boolean
  }

  /** How object-store substrates are handled. Process-wide because the
    * contract it selects is itself process-scoped (SingleWriter) or
    * externally scoped (Coordinated).
    */
  sealed trait ObjectStoreMode
  /** Default: refuse with an error naming the missing contract. */
  case object Refuse extends ObjectStoreMode
  /** The Delta "S3 single-driver" contract: ONE writer process per
    * table; claims arbitrate in-process (exists-check + whole-object
    * PUT under the per-dir lock). Exact for one process, UNSAFE if two
    * processes write one table — that needs [[Coordinated]].
    */
  case object SingleWriter extends ObjectStoreMode
  /** Multi-writer object-store commits through an external
    * [[ClaimCoordinator]] (conditional-write service, lock table, …).
    */
  final case class Coordinated(coordinator: ClaimCoordinator) extends ObjectStoreMode

  @volatile var objectStoreMode: ObjectStoreMode = Refuse

  private def refuseObjectStore(fs: FileSystem, path: Path, op: String): Nothing =
    throw new IllegalStateException(
      s"$op at $path: the ${schemeOf(fs)}:// substrate is an object store " +
        "with no atomic rename, no hard links and no " +
        "refuse-on-existing-destination — the primitives this lake's " +
        "commit protocol requires (POSIX rename/link(2) locally, " +
        "FileContext rename on HDFS-class stores). Running it here would " +
        "silently lose commits under concurrent writers. Opt in " +
        "explicitly: LakeIo.objectStoreMode = LakeIo.SingleWriter (ONE " +
        "writer process per table, Delta's S3 single-driver contract) or " +
        "LakeIo.Coordinated(coordinator) (external first-writer-wins " +
        "service for multi-writer).")

  /** Fail fast (BEFORE any data job runs) when `fs` is an object store
    * and no opt-in mode is set — the same refusal the first metadata
    * publication would raise, surfaced at operation entry.
    */
  def requireCommitCapable(fs: FileSystem, path: Path, op: String): Unit =
    if (isObjectStore(fs) && objectStoreMode == Refuse)
      refuseObjectStore(fs, path, op)

  /** Whole-object PUT: on a real object store create()'s stream uploads
    * and the object becomes visible ATOMICALLY at close — no tmp, no
    * rename, no partial-content window. Last writer wins.
    */
  private def putWhole(fs: FileSystem, path: Path, text: String): Unit = {
    val out = fs.create(path, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def tmpSibling(path: Path): Path =
    new Path(path.getParent,
      s"$TmpPrefix${java.util.UUID.randomUUID().toString.replace("-", "")}")

  /** The raw (sidecar-free) filesystem for local paths; identity
    * elsewhere. Metadata through raw = half the ops and no crc to race.
    */
  private def rawFor(fs: FileSystem): FileSystem = fs match {
    case c: ChecksumFileSystem => c.getRawFileSystem
    case other                 => other
  }

  private def writeTmp(fs: FileSystem, path: Path, text: String): Path = {
    val tmp = tmpSibling(path)
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  /** Drop a legacy checksum sidecar so a raw (crc-less) publish can
    * never leave a stale crc that fails every subsequent read.
    */
  private def dropSidecar(c: ChecksumFileSystem, path: Path): Unit = {
    val crc = c.getChecksumFile(path)
    val raw = c.getRawFileSystem
    if (raw.exists(crc)) raw.delete(crc, false): Unit
  }

  // one FileContext per (scheme, authority); thread-safe as used here
  // (no umask/working-dir mutation)
  private val fileContexts =
    new java.util.concurrent.ConcurrentHashMap[String, FileContext]()

  private def contextFor(fs: FileSystem, path: Path): FileContext = {
    val uri = fs.makeQualified(path).toUri
    val key = uri.getScheme + "://" + Option(uri.getAuthority).getOrElse("")
    fileContexts.computeIfAbsent(key,
      _ => FileContext.getFileContext(uri, fs.getConf))
  }

  // in-JVM serialization for the exclusive publish: the local layers'
  // dst-exists checks are check-then-rename, so two same-JVM racers
  // need the lock to keep first-writer-wins exact. Keyed by PARENT dir
  // (one entry per log dir, bounded by table count) — a full-path key
  // would grow one never-evicted entry per commit record forever in a
  // long-lived driver. Coarser is harmless: same-dir publishes are
  // near-instant metadata ops, and same-table commits already serialize
  // on CommitLog's own lock.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** A publication failure caused by the destination's PARENT DIRECTORY
    * moving mid-publish — a staged swap's gather renames the whole log
    * dir into its stage while a concurrent commit is between its tmp
    * create and its rename (witnessed as `chmod: cannot access .tmp_*`
    * from the create's permission step in CrossProcessProbe phase B).
    * Transient by design: the swap contract says racing commits land in
    * a RECREATED live log dir (where the post-swap audit sees them), and
    * a retried publication recreates it via create/mkdirs. Bounded, so
    * real failures (permissions, full disk) still surface.
    */
  private def parentTorn(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = c.getMessage
      if (m != null && (m.contains("No such file or directory") ||
          m.startsWith("could not publish"))) return true
      c = if (c.getCause != c) c.getCause else null
    }
    false
  }

  private def retryParentTorn[T](fs: FileSystem, path: Path)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: java.io.IOException if parentTorn(e) && attempt < 8 =>
          attempt += 1
          try fs.mkdirs(path.getParent): Unit
          catch { case _: java.io.IOException => () }
          Thread.sleep(10L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Publish `text` at `path`, atomically replacing any previous
    * content.
    */
  def atomicOverwrite(fs: FileSystem, path: Path, text: String): Unit =
    if (isObjectStore(fs)) objectStoreMode match {
      case Refuse => refuseObjectStore(fs, path, "atomicOverwrite")
      // replace-or-create IS the object store's native op: one whole-
      // object PUT, atomic at close, last writer wins — the tmp+rename
      // dance exists only where create() exposes partial content
      case _ => putWhole(fs, path, text)
    }
    else retryParentTorn(fs, path)(atomicOverwriteOnce(fs, path, text))

  private def atomicOverwriteOnce(fs: FileSystem, path: Path, text: String): Unit = fs match {
    case c: ChecksumFileSystem =>
      val raw = c.getRawFileSystem
      val tmp = writeTmp(raw, path, text)
      dropSidecar(c, path)
      // ONE POSIX rename: atomic replace, no absence window, no crc
      if (!raw.rename(tmp, path))
        throw new java.io.IOException(
          s"could not publish $path: rename $tmp -> $path failed")
    case other =>
      val tmp = writeTmp(other, path, text)
      var attempt = 0
      while (true) {
        try {
          contextFor(other, path).rename(
            other.makeQualified(tmp), other.makeQualified(path),
            Options.Rename.OVERWRITE)
          return
        } catch {
          // a concurrent overwriter's rename landed inside ours —
          // re-running the whole OVERWRITE converges (both contents
          // were complete files; last writer wins)
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
              _: java.nio.file.FileAlreadyExistsException if attempt < 8 =>
            attempt += 1
            Thread.sleep(10L * attempt)
          case _: UnsupportedOperationException |
              _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            if (other.exists(path)) other.delete(path, false): Unit
            if (!other.rename(tmp, path))
              throw new java.io.IOException(
                s"could not publish $path: rename $tmp -> $path failed")
            return
        }
      }
  }

  /** Read a metadata file published through [[atomicOverwrite]],
    * absorbing the transient artifacts a read racing a republish can
    * still show: a vanish between the exists check and the open (the
    * rename is atomic, the check-then-open pair is not) and, on legacy
    * checksummed files, a brief data/.crc mismatch. Both resolve on a
    * re-read because the writer's content is always a complete file;
    * after `attempts` the error is real and surfaces. A durably absent
    * file returns None immediately — under the one-rename publication
    * there is no absence window to wait out (this is every serve's
    * fast path for unstamped indexes).
    */
  def resilientRead(fs: FileSystem, path: Path, attempts: Int = 8): Option[String] = {
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(path)) return None
        val in = fs.open(path)
        try return Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
        finally in.close()
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
    * concurrent writer won the name. Cross-process exclusivity is the
    * filesystem's contract on BOTH regimes: HDFS rename (server-side
    * atomic refuse) and local hard-link (kernel EEXIST refuse);
    * in-JVM racers additionally serialize on the per-dir lock.
    */
  def renamePublish(fs: FileSystem, path: Path, text: String): Boolean =
    if (isObjectStore(fs)) objectStoreMode match {
      case Refuse => refuseObjectStore(fs, path, "renamePublish")
      case SingleWriter =>
        // Delta's S3 single-driver LogStore contract: the claim
        // arbitrates IN PROCESS (per-dir lock + exists-check), then one
        // whole-object PUT publishes. Exact for the one writer process
        // the mode's contract allows; a second process racing this one
        // is outside the contract and must use Coordinated.
        publishLocks.computeIfAbsent(
          fs.makeQualified(path).getParent.toString, _ => new Object).synchronized {
          if (fs.exists(path)) false
          else { putWhole(fs, path, text); true }
        }
      case Coordinated(coordinator) =>
        // external first-writer-wins on the claim KEY; the winner's PUT
        // is whole-object atomic so readers never see a torn claim
        if (!coordinator.claim(fs.makeQualified(path).toString)) false
        else { putWhole(fs, path, text); true }
    }
    else retryParentTorn(fs, path)(renamePublishOnce(fs, path, text))

  private def renamePublishOnce(fs: FileSystem, path: Path, text: String): Boolean =
    publishLocks.computeIfAbsent(
      fs.makeQualified(path).getParent.toString, _ => new Object).synchronized {
      fs match {
        case c: ChecksumFileSystem =>
          val raw = c.getRawFileSystem
          if (raw.exists(path)) return false
          val tmp = writeTmp(raw, path, text)
          dropSidecar(c, path)
          // CROSS-PROCESS first-writer-wins: hard-link the finished tmp
          // to the claim name — link(2) refuses an existing destination
          // ATOMICALLY at the kernel, so two separate JVMs racing one
          // version claim get exactly one winner (POSIX rename clobbers,
          // which is why the pre-upgrade local branch was in-JVM-only).
          val dst = java.nio.file.Paths.get(raw.makeQualified(path).toUri.getPath)
          val src = java.nio.file.Paths.get(raw.makeQualified(tmp).toUri.getPath)
          try {
            java.nio.file.Files.createLink(dst, src)
            java.nio.file.Files.deleteIfExists(src): Unit
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.deleteIfExists(src): Unit
              false
            case _: UnsupportedOperationException |
                _: java.nio.file.FileSystemException =>
              // a local fs without hard links (rare): fall back to the
              // lock + exists-check + rename pair — exact in-JVM, the
              // pre-upgrade contract
              if (raw.exists(path)) { raw.delete(tmp, false): Unit; false }
              else if (raw.rename(tmp, path)) true
              else { raw.delete(tmp, false): Unit; false }
          }
        case other =>
          if (other.exists(path)) return false
          val tmp = writeTmp(other, path, text)
          try {
            contextFor(other, path).rename(
              other.makeQualified(tmp), other.makeQualified(path))
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException =>
              other.delete(tmp, false): Unit
              false
            case _: UnsupportedOperationException |
                _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              val ok = other.rename(tmp, path)
              if (!ok) other.delete(tmp, false): Unit
              ok
          }
      }
    }
}
