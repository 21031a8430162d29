package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

/** File-backed [[LakeIo.ClaimCoordinator]] — the local stand-in for the
  * conditional-write service the Coordinated object-store mode needs
  * (the seam the public Delta S3 multi-cluster LogStore design fills
  * with DynamoDB conditional writes). One claim = one file under a
  * shared LOCAL coordination directory, holding the claim's stagedRef
  * and its key:
  *
  *   - exactly-once across PROCESSES: the claim file is content-written
  *     to a private temp first, then HARD-LINKED to its claim name —
  *     link(2) refuses an existing destination atomically at the kernel
  *     (the same primitive [[LakeIo.renamePublish]] uses for local
  *     commit records), so two processes racing one key get exactly one
  *     winner and no reader ever observes a torn (empty) claim;
  *   - recoverable: [[claimedRef]] returns the winner's staged-content
  *     pointer, so any process can complete a claimed-but-unpublished
  *     object (the crash-between-claim-and-PUT recovery);
  *   - boundable: [[expire]] reclaims claim records whose object
  *     provably landed (one file per commit otherwise accumulates
  *     forever — the DynamoDB LogStore design's TTL, made safe here by
  *     LakeIo's exists-precheck: a completed version's key is never
  *     re-claimed, so deleting its record cannot reopen the race).
  *
  * Suitable for tests and single-host multi-process deployments (the
  * coordination dir must be a real POSIX filesystem, NOT an object
  * store); a production multi-cluster deployment implements the same
  * two-method interface against its conditional-write service.
  */
final class FileClaimCoordinator(dir: String) extends LakeIo.ClaimCoordinator {

  private val root = Paths.get(dir)
  Files.createDirectories(root): Unit

  private def fileFor(key: String): java.nio.file.Path = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(key.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    root.resolve(s"claim_$hex")
  }

  override def claim(key: String, stagedRef: String): Boolean = {
    val tmp = Files.createTempFile(root, ".claimtmp_", "")
    try {
      // line 1: the recovery pointer; line 2: the claim's own key, so
      // expire() can check the published object without reversing the
      // filename hash (neither value contains a newline — both are
      // qualified fs paths)
      Files.write(tmp,
        s"$stagedRef\n$key".getBytes(StandardCharsets.UTF_8)): Unit
      try { Files.createLink(fileFor(key), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp): Unit
  }

  override def claimedRef(key: String): Option[String] =
    try Some(new String(Files.readAllBytes(fileFor(key)), StandardCharsets.UTF_8))
      .map(_.split("\n", 2)(0))
      .filter(_.nonEmpty)
    catch { case _: java.io.IOException => None }

  /** Conditional-write delete — the slot-release half of the contract
    * (see [[LakeIo.ClaimCoordinator.release]]).
    */
  override def release(key: String): Unit =
    Files.deleteIfExists(fileFor(key)): Unit

  /** Reclaim claim records older than `olderThanMs` whose key satisfies
    * `completed` — pass [[FileClaimCoordinator.completedOn]] for lake
    * tables (a bare existence check under-reclaims: checkpoints fold
    * per-commit files away, leaving their claims looking like crashed
    * winners forever). Claims for keys that never provably landed are
    * kept regardless of age — they are the recovery pointers for a
    * crashed winner, and deleting one wedges that version permanently.
    * Pre-key-format records (no second line) are kept: their key is
    * unknowable, and keeping them is the conservative side. Returns the
    * number of records reclaimed.
    */
  def expire(
      olderThanMs: Long,
      completed: String => Boolean): Int = {
    val now = System.currentTimeMillis()
    val files = Option(root.toFile.listFiles()).getOrElse(Array.empty)
    files.count { f =>
      f.getName.startsWith("claim_") &&
        now - f.lastModified() >= olderThanMs && {
          val key =
            try new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
              .split("\n", 2) match {
                case Array(_, k) if k.nonEmpty => Some(k)
                case _ => None
              }
            catch { case _: java.io.IOException => None }
          key.exists(completed) && Files.deleteIfExists(f.toPath)
        }
    }
  }
}

object FileClaimCoordinator {

  /** The canonical `completed` predicate for [[FileClaimCoordinator.expire]]
    * over a lake table's claims: a key's object provably LANDED if it
    * exists — or, for a commit-log record, if any LATER version exists.
    * The second clause matters: checkpoints fold per-commit files away
    * (every 100 commits by default), and a bare existence check then
    * keeps every folded commit's claim forever as a false crashed
    * winner — unbounded growth again. Versions are dense (claims only
    * land at max(listed)+1), so a successor's existence proves this
    * version was published at some point; the true crashed winner sits
    * at max+1 and stays protected.
    */
  def completedOn(fs: org.apache.hadoop.fs.FileSystem): String => Boolean = key => {
    val p = new org.apache.hadoop.fs.Path(new java.net.URI(key))
    fs.exists(p) || {
      val name = p.getName
      name.endsWith(".json") &&
        scala.util.Try(name.stripSuffix(".json").toLong).toOption
          .exists(v => CommitLog.nextVersion(fs, p.getParent) > v)
    }
  }
}
