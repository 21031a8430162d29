package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

/** File-backed [[LakeIo.ClaimCoordinator]] — the local stand-in for the
  * conditional-write service the Coordinated object-store mode needs
  * (the seam the public Delta S3 multi-cluster LogStore design fills
  * with DynamoDB conditional writes). One claim = one file under a
  * shared LOCAL coordination directory, holding the claim's stagedRef:
  *
  *   - exactly-once across PROCESSES: the claim file is content-written
  *     to a private temp first, then HARD-LINKED to its claim name —
  *     link(2) refuses an existing destination atomically at the kernel
  *     (the same primitive [[LakeIo.renamePublish]] uses for local
  *     commit records), so two processes racing one key get exactly one
  *     winner and no reader ever observes a torn (empty) claim;
  *   - recoverable: [[claimedRef]] returns the winner's staged-content
  *     pointer, so any process can complete a claimed-but-unpublished
  *     object (the crash-between-claim-and-PUT recovery).
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
      Files.write(tmp, stagedRef.getBytes(StandardCharsets.UTF_8)): Unit
      try { Files.createLink(fileFor(key), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp): Unit
  }

  override def claimedRef(key: String): Option[String] =
    try Some(new String(Files.readAllBytes(fileFor(key)), StandardCharsets.UTF_8))
      .filter(_.nonEmpty)
    catch { case _: java.io.IOException => None }
}
