package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared commit-log machinery for [[LakeTable]] and
  * [[VersionedLakeTable]] — one JSON file per commit under
  * `_graft_log/`, ordered by a zero-padded commit id.
  */
private[sources] object CommitLog {

  def currentCount(fs: FileSystem, logDir: Path): Long =
    records(fs, logDir).size.toLong

  private def parseVersion(name: String): Option[Long] =
    if (name.endsWith(".json"))
      scala.util.Try(name.stripSuffix(".json").toLong).toOption
    else None

  private def parseCheckpointVersion(name: String): Option[Long] =
    if (name.endsWith(".checkpoint"))
      scala.util.Try(name.stripSuffix(".checkpoint").toLong).toOption
    else None

  /** The version the NEXT commit will claim: max committed + 1. Derived
    * from the max, not the file count, so a log with gaps (manual
    * cleanup, failed half-commits) still moves forward monotonically.
    * A checkpoint file's version counts too — after a checkpoint deletes
    * the per-commit files it covers, it IS the record of those versions.
    */
  def nextVersion(fs: FileSystem, logDir: Path): Long =
    if (!fs.exists(logDir)) 0L
    else fs.listStatus(logDir)
      .flatMap(st => parseVersion(st.getPath.getName)
        .orElse(parseCheckpointVersion(st.getPath.getName)))
      .foldLeft(-1L)(math.max) + 1

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Every commit record in version order, reading the LATEST checkpoint
    * (one file holding every folded record as a JSON line) plus only the
    * per-commit files after it — the Delta checkpoint read path: O(1 +
    * commits-since-checkpoint) file reads however long the table has
    * lived, instead of O(total commits). Commit files at or below the
    * checkpoint that a crashed cleanup left behind are ignored (their
    * records are already in the checkpoint).
    */
  def records(fs: FileSystem, logDir: Path): Seq[String] = {
    // the commit lock serializes WRITERS only; a concurrent checkpoint
    // may fold-and-delete commit files between our listStatus snapshot
    // and the reads below. The fresh listing then has a newer checkpoint
    // covering every deleted file, so retrying is both sufficient and
    // bounded (one retry per checkpoint racing us; 5 caps pathology)
    var attempt = 0
    while (true) {
      try return recordsOnce(fs, logDir)
      catch {
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    Nil // unreachable
  }

  private def recordsOnce(fs: FileSystem, logDir: Path): Seq[String] = {
    if (!fs.exists(logDir)) return Nil
    val sts = fs.listStatus(logDir)
    val cp = sts
      .flatMap(st => parseCheckpointVersion(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1).lastOption
    val cpv = cp.map(_._1).getOrElse(-1L)
    val base = cp.toSeq.flatMap { case (_, p) =>
      readFile(fs, p).split('\n').toSeq.filter(_.nonEmpty)
    }
    val tail = sts
      .flatMap(st => parseVersion(st.getPath.getName)
        .filter(_ > cpv).map(_ -> st.getPath))
      .sortBy(_._1)
      .map { case (_, p) => readFile(fs, p) }
    base ++ tail
  }

  /** The `"version":N` of one serialized record (records are written by
    * [[append]], so the field leads and is unquoted).
    */
  private def recordVersion(r: String): Long = {
    val i = r.indexOf(':') + 1
    val j = r.indexOf(',', i)
    r.substring(i, j).trim.toLong
  }

  /** One parsed commit record — the driver-side view OCC conflict
    * resolution reads to classify interloping commits (Delta VLDB'20
    * §3.2 re-checks LOGICAL conflict after losing the version race).
    */
  final case class CommitRecord(
      version: Long, operation: String, params: Map[String, String],
      timestamp: String = "")

  /** Read the quoted string whose opening `"` is at or after `from`,
    * honoring backslash escapes; returns (unescaped value, index after
    * the closing quote).
    */
  private def quoted(r: String, from: Int): (String, Int) = {
    val start = r.indexOf('"', from) + 1
    var i = start
    while (r(i) != '"') { if (r(i) == '\\') i += 2 else i += 1 }
    (unesc(r.substring(start, i)), i + 1)
  }

  /** Parse one record serialized by [[append]] — this object's exact
    * shape (leading unquoted version, [[esc]]'d keys and values), not
    * general JSON; the log never holds records from any other writer.
    */
  private[sources] def parseRecord(r: String): CommitRecord = {
    val opAt = r.indexOf("\"operation\":")
    val (op, afterOp) = quoted(r, opAt + "\"operation\":".length - 1)
    var i = r.indexOf('{', r.indexOf("\"operationParameters\":", afterOp)) + 1
    val params = Map.newBuilder[String, String]
    var scanning = true
    while (scanning) {
      while (r(i) == ',' || r(i) == ' ') i += 1
      if (r(i) == '}') scanning = false
      else {
        val (k, a) = quoted(r, i)
        val (v, b) = quoted(r, a) // skips the `:` to the value's quote
        params += k -> v
        i = b
      }
    }
    val tsAt = r.indexOf("\"timestamp\":")
    val ts = if (tsAt < 0) "" else quoted(r, tsAt + "\"timestamp\":".length - 1)._1
    CommitRecord(recordVersion(r), op, params.result(), ts)
  }

  /** Every commit record with version >= `from`, parsed — the interloper
    * list an OCC loser inspects before deciding rebase-or-fail. O(commits
    * since the last checkpoint) file reads, same as any log read.
    */
  def recordsSince(fs: FileSystem, logDir: Path, from: Long): Seq[CommitRecord] =
    records(fs, logDir).map(parseRecord).filter(_.version >= from)

  /** [[recordsSince]] reading ONLY the files that can hold versions
    * `>= from`: per-commit files at those versions, plus the checkpoint
    * content only when the checkpoint reaches back to `from`. O(head
    * distance) reads instead of O(total commits) — the difference
    * between [[appendIfAbsent]] costing a constant near the log head
    * (its common case: `from` is the operation's OCC base) and every
    * Nth maintenance commit paying an N-file scan.
    */
  private def recordsTail(fs: FileSystem, logDir: Path, from: Long): Seq[CommitRecord] = {
    if (!fs.exists(logDir)) return Nil
    var attempt = 0
    while (true) {
      try {
        val sts = fs.listStatus(logDir)
        val cp = sts
          .flatMap(st => parseCheckpointVersion(st.getPath.getName).map(_ -> st.getPath))
          .sortBy(_._1).lastOption
        val cpv = cp.map(_._1).getOrElse(-1L)
        val base =
          if (cpv < from) Nil
          else cp.toSeq.flatMap { case (_, p) =>
            readFile(fs, p).split('\n').toSeq.filter(_.nonEmpty)
          }
        val tail = sts
          .flatMap(st => parseVersion(st.getPath.getName)
            .filter(v => v > cpv && v >= from).map(_ -> st.getPath))
          .sortBy(_._1)
          .map { case (_, p) => readFile(fs, p) }
        return (base ++ tail).map(parseRecord).filter(_.version >= from)
      } catch {
        // same torn-checkpoint retry contract as records()
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    Nil // unreachable
  }

  /** Fold every record `<= v` into `<v>.checkpoint` (write-temp-then-
    * rename, so readers only ever see a complete checkpoint), then
    * delete the per-commit files it covers. Failures are swallowed: a
    * checkpoint is an optimization, never required for correctness —
    * the worst outcome of a crash here is extra small files (a stale
    * tmp, uncovered commit files), both ignored or retried by the next
    * checkpoint.
    */
  private def writeCheckpoint(fs: FileSystem, logDir: Path, v: Long): Unit =
    try {
      val keep = records(fs, logDir).filter(r => recordVersion(r) <= v)
      val cpPath = new Path(logDir, f"$v%020d.checkpoint")
      if (fs.exists(cpPath)) return
      val tmp = new Path(logDir, f"$v%020d.cptmp")
      val out = fs.create(tmp, true)
      try out.write(keep.mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, cpPath)) {
        fs.listStatus(logDir).foreach { st =>
          val name = st.getPath.getName
          if (parseVersion(name).exists(_ <= v) ||
            parseCheckpointVersion(name).exists(_ < v))
            fs.delete(st.getPath, false): Unit
        }
      }
    } catch { case scala.util.control.NonFatal(_) => }

  private[sources] def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Inverse of [[esc]] (used by the pending-op swap record, which reuses
    * esc so multi-line predicates survive a line-oriented file format).
    */
  private[sources] def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case _ => sb += s(i); i += 1
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  /** Append one commit record ATOMICALLY and return its version.
    *
    * Optimistic concurrency in the style of Delta's commit protocol
    * (Delta Lake, VLDB'20 §3.2): every writer races to put-if-absent the
    * next version file (`create(..., overwrite = false)`); exactly one
    * wins, the loser observes `FileAlreadyExistsException`, recomputes
    * the next version, and retries. No commit is ever silently
    * overwritten — the previous `overwrite = true` create meant two
    * concurrent writers could agree on a version and one record was
    * LOST. Atomic create-if-absent holds on HDFS and local filesystems;
    * S3-style object stores need a conditional-put or coordination
    * service for the same guarantee — exactly Delta's constraint.
    */
  /** Per-log JVM lock: Hadoop's local `create(overwrite = false)` checks
    * existence THEN opens the stream (a TOCTOU window), so two threads of
    * the SAME driver could both "win" a version and one record would be
    * lost. Writers in one JVM serialize here; writers in different JVMs
    * rely on the filesystem's atomic create-if-absent (HDFS guarantees
    * it; object stores need conditional-put — Delta's constraint too).
    */
  private val commitLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Highest version this PROCESS has ever committed per log dir. A
    * staged swap's gather moves the whole log dir into its stage, so a
    * commit racing that window lists an absent/recreated dir and would
    * compute a version the table already used — its claim then lands as
    * a DUPLICATE version file that shadows a historical record when the
    * swap's log merge reunites the two dirs. Claiming
    * `max(listed, highWater + 1)` makes any long-lived writer (streaming
    * sink, maintenance loop, repeated appender) immune; a brand-new
    * process attaching in exactly that window remains the documented
    * metadata-only residue (its data files still survive via the
    * late-append sweep and the known-set clear guard).
    */
  private val highWater = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** @param checkpointEvery fold the log into a checkpoint whenever the
    *                        committed version is a positive multiple of
    *                        this; `<= 0` disables checkpointing.
    */
  def append(
      fs: FileSystem, logDir: Path, op: String, params: Map[String, String],
      checkpointEvery: Int = 100): Long =
    commitLocks.computeIfAbsent(logDir.toString, _ => new Object).synchronized {
      val v = appendRacing(fs, logDir, op, params)
      if (checkpointEvery > 0 && v > 0 && v % checkpointEvery == 0)
        writeCheckpoint(fs, logDir, v)
      v
    }

  /** Conditional [[append]]: commit `(op, params)` only if NO commit at
    * or after `base` already carries `params(keyParam) == keyValue`;
    * otherwise ADOPT that commit. Returns (version, committedByUs).
    *
    * This is exactly-once ATTRIBUTION for twin writers — a live writer
    * and a recovery (vacuumDebris, a peer's cold start) both holding one
    * marked stage. The plain adopt-or-commit pattern is check-then-act:
    * both twins can pass the "not yet attributed" check before either
    * commits, double-attributing one data change. Here the check is
    * ordered against the log's total version order: each attempt
    * computes its claim version `v` FIRST, then scans `[base, v)`, then
    * claims EXACTLY `v` ([[LakeIo.renamePublish]] refuses an existing
    * name atomically). Claims only ever land at `max(listed) + 1`, so
    * every version below `v` exists — immutably — when `v` is computed;
    * a winning claim therefore proves no commit below `v` carries the
    * key, and the losing twin's next attempt scans a range that now
    * includes `v` and adopts. Assumes the log dir does not LOSE records
    * mid-race (a truncated log plus the in-process high-water guard
    * could leave a claimable gap below `v` — the same assumption
    * [[append]]'s racing loop already makes).
    */
  def appendIfAbsent(
      fs: FileSystem, logDir: Path, op: String, params: Map[String, String],
      keyParam: String, keyValue: String, base: Long,
      checkpointEvery: Int = 100): (Long, Boolean) =
    commitLocks.computeIfAbsent(logDir.toString, _ => new Object).synchronized {
      if (!fs.exists(logDir)) fs.mkdirs(logDir)
      val paramJson = paramJsonOf(params)
      val maxAttempts = 100
      var attempt = 0
      while (attempt < maxAttempts) {
        val hw = Option(highWater.get(logDir.toString)).map(_.longValue).getOrElse(-1L)
        val v = math.max(nextVersion(fs, logDir), hw + 1)
        recordsTail(fs, logDir, base)
          .find(_.params.get(keyParam).contains(keyValue)) match {
          case Some(prior) => return (prior.version, false)
          case None =>
            if (LakeIo.renamePublish(
                fs, new Path(logDir, f"$v%020d.json"), recordJson(v, op, paramJson))) {
              highWater.merge(logDir.toString, java.lang.Long.valueOf(v),
                (a, b) => if (a >= b) a else b)
              if (checkpointEvery > 0 && v > 0 && v % checkpointEvery == 0)
                writeCheckpoint(fs, logDir, v)
              return (v, true)
            }
            attempt += 1
        }
      }
      throw new IllegalStateException(
        s"commit contention: lost $maxAttempts consecutive version races under $logDir")
    }

  private def paramJsonOf(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, w) => s""""${esc(k)}":"${esc(w)}"""" }
      .mkString("{", ",", "}")

  private def recordJson(v: Long, op: String, paramJson: String): String = {
    val ts = java.time.Instant.now().toString
    s"""{"version":$v,"timestamp":"$ts","operation":"$op","operationParameters":$paramJson}"""
  }

  private def appendRacing(
      fs: FileSystem, logDir: Path, op: String, params: Map[String, String]): Long = {
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val paramJson = paramJsonOf(params)
    val maxAttempts = 100
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val hw = Option(highWater.get(logDir.toString)).map(_.longValue).getOrElse(-1L)
      val v = math.max(nextVersion(fs, logDir), hw + 1)
      // content-first publication (LakeIo): a bare create-then-write
      // left the record VISIBLE while empty, and a concurrent log scan
      // parsing it died on "no content to map" (witnessed killing a
      // live maintenance stream); the rename still refuses an existing
      // name, so version races lose exactly as before
      if (LakeIo.renamePublish(
          fs, new Path(logDir, f"$v%020d.json"), recordJson(v, op, paramJson))) {
        committed = v
        highWater.merge(logDir.toString, java.lang.Long.valueOf(v),
          (a, b) => if (a >= b) a else b)
      } else {
        attempt += 1
        require(attempt < maxAttempts,
          s"commit contention: lost $maxAttempts consecutive version races under $logDir")
      }
    }
    committed
  }

  /** History DataFrame; stable empty shape for fresh tables (see
    * [[LakeTable.history]] for the operationParameters caveat). Built
    * from [[records]], so checkpointed commits whose per-file records
    * were compacted away still appear.
    */
  def history(spark: SparkSession, fs: FileSystem, tablePath: String, logDir: Path): DataFrame = {
    import spark.implicits._
    val recs = records(fs, logDir)
    if (recs.isEmpty)
      Seq.empty[(Long, String, String)].toDF("version", "operation", "timestamp")
    else
      spark.read.json(recs.toDS()).orderBy(col("version").desc)
  }
}
