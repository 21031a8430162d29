package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store SIMULATION over local disk with honest S3-class
  * semantics — the substrate the object-store opt-in modes are proven
  * against (ObjectStoreSpec walks it under crash fuses; CoordProbe runs
  * it across real processes):
  *
  *   - `getScheme` reports `s3a`, so [[LakeIo.isObjectStore]] detection
  *     fires exactly as it would against a real bucket;
  *   - `rename` is CLIENT-SIDE COPY + DELETE — never atomic, and it
  *     REFUSES an existing destination FILE (S3AFileSystem checks dest
  *     and returns false before any copy), so a crashed rename that
  *     completed its copy but not its source delete leaves src+dst BOTH
  *     present and every retry gets `false` (promoteFile's
  *     completed-copy tolerance exists for exactly this state);
  *   - `create` buffers and materializes the object ATOMICALLY AT CLOSE
  *     (whole-object PUT): a crash before close leaves NOTHING, and
  *     partial content is never visible — the one honest guarantee
  *     object stores do give.
  *
  * The `onRead`/`onMutation` hooks are fault-injection seams: no-ops
  * here, wired to the crash fuse by the test-side subclass.
  */
class S3SimFs extends RawLocalFileSystem {

  protected def onRead(): Unit = ()
  protected def onMutation(): Unit = ()

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
      super.listStatus(src).foreach(c =>
        copyRec(c.getPath, new Path(dst, c.getPath.getName)))
    } else copyFile(src, dst)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    onRead()
    if (!super.exists(src)) return false
    if (super.exists(dst) && super.getFileStatus(dst).isFile) return false
    copyRec(src, dst)
    onMutation()
    super.delete(src, true)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    onMutation(); super.delete(p, recursive)
  }
  // object stores have no directories — mkdirs is free and unfailing
  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    onRead(); super.mkdirs(p, permission)
  }
  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    onRead() // opening an upload is not yet a visible mutation
    val buf = new java.io.ByteArrayOutputStream()
    val self = this
    val stream = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        // the PUT: one mutation, visible whole or not at all — ACROSS
        // PROCESSES too. A plain local create() makes the file visible
        // (empty) before the bytes land, a window a reader in another
        // JVM can observe (CoordProbe forks real JVMs); a real PUT never
        // exposes partials. Materialize to a dot-prefixed upload temp,
        // then: overwrite → rename(2) into place (atomic clobber, the
        // S3 PUT contract); no-overwrite → hard-link (atomic refusal of
        // an existing object). A crash mid-close leaves only the temp —
        // invisible to listings-by-suffix and never parsed as data.
        onMutation()
        val target = self.pathToFile(f).toPath
        Option(target.getParent)
          .foreach(p => java.nio.file.Files.createDirectories(p): Unit)
        val tmp = target.resolveSibling(
          s".s3put_${java.util.UUID.randomUUID().toString.take(12)}")
        java.nio.file.Files.write(tmp, buf.toByteArray): Unit
        try {
          if (overwrite)
            java.nio.file.Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          else java.nio.file.Files.createLink(target, tmp): Unit
        } finally java.nio.file.Files.deleteIfExists(tmp): Unit
      }
    }
    new FSDataOutputStream(stream, null)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    onRead(); super.open(f, bufferSize)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    onRead(); super.listStatus(f)
  }
  override def getFileStatus(f: Path): FileStatus = {
    onRead(); super.getFileStatus(f)
  }
  override def mkdirs(p: Path): Boolean = { onRead(); super.mkdirs(p) }
}
