package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** A test-only Hadoop filesystem with OBJECT-STORE-GRADE weak
  * semantics over local disk, registered under `weakfs:` — the
  * executable stand-in for the two substrate caveats ServingStore's
  * scaladoc used to carry as prose (r12 verdict ask #1):
  *
  *  - `rename` is COPY-THEN-DELETE, not atomic (the S3 emulation),
  *    with an injectable mid-copy pause so a spec can hold the
  *    destination file in a provably HALF-WRITTEN state and probe what
  *    a reader sees during a torn `CURRENT` publish;
  *  - `create(overwrite = false)` can be weakened to NOT be exclusive
  *    (S3 before strong consistency; any store whose create-exclusive
  *    is advisory), so two concurrent fitters both "win" the lease
  *    and the convergence behavior downstream becomes testable.
  *
  * Both weaknesses are OFF by default and engaged per-test through the
  * static hooks on the companion — the static sharing is deliberate:
  * Hadoop may instantiate several instances (FileSystem cache,
  * FileContext's AbstractFileSystem delegate) and the injected
  * weakness must apply to all of them. Extends RawLocalFileSystem so
  * everything not deliberately weakened behaves exactly like a real
  * local filesystem (and without checksum `.crc` sidecars muddying
  * byte-level assertions).
  */
class WeakFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "weakfs"
  override def getUri: URI = URI.create("weakfs:///")

  override def rename(src: Path, dst: Path): Boolean =
    if (WeakFileSystem.tornRenameTarget.contains(dst.getName)) {
      // Object-store emulation: read source, write destination bytes
      // IN PLACE (truncating), pause mid-copy with the partial content
      // visible to readers, then finish and delete the source.
      val st = getFileStatus(src)
      val data = new Array[Byte](st.getLen.toInt)
      val in = open(src)
      try in.readFully(0L, data) finally in.close()
      val out = super.create(dst, true, 4096, 1.toShort, 33554432L)
      val cut = math.min(4, data.length) // "gen-" of "gen-<fp>\n": never a valid name
      try {
        out.write(data, 0, cut)
        out.flush()
        WeakFileSystem.renameEntered.countDown()
        // The spec probes the torn state now, then releases the latch.
        WeakFileSystem.renameResume.await(30, java.util.concurrent.TimeUnit.SECONDS)
        out.write(data, cut, data.length - cut)
      } finally out.close()
      super.delete(src, false)
      true
    } else super.rename(src, dst)

  // Weak create-exclusive: when engaged, a second contender's
  // create(overwrite = false) on the lease SUCCEEDS instead of
  // throwing FileAlreadyExistsException — the store's atomicity
  // assumption, deliberately broken. RawLocalFileSystem implements
  // BOTH public create variants directly (the boolean chain does not
  // route through the FsPermission one), so both are weakened.
  private def weakened(f: Path, overwrite: Boolean): Boolean =
    overwrite ||
      (WeakFileSystem.weakCreateExclusive && f.getName == "_LOCK.lease")

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, weakened(f, overwrite), bufferSize,
      replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, weakened(f, overwrite), bufferSize,
      replication, blockSize, progress)
}

object WeakFileSystem {
  /** File NAME whose rename runs the pausing copy+delete path. */
  @volatile var tornRenameTarget: Option[String] = None
  /** Counted down once the torn rename has written its partial bytes. */
  @volatile var renameEntered = new java.util.concurrent.CountDownLatch(1)
  /** Released by the spec once it has probed the torn state. */
  @volatile var renameResume = new java.util.concurrent.CountDownLatch(1)
  /** Engages the non-exclusive create(overwrite = false) on leases. */
  @volatile var weakCreateExclusive = false

  def reset(): Unit = {
    tornRenameTarget = None
    weakCreateExclusive = false
    renameEntered = new java.util.concurrent.CountDownLatch(1)
    renameResume = new java.util.concurrent.CountDownLatch(1)
  }

  /** Register weakfs on a Hadoop configuration — both the FileSystem
    * binding (the fingerprint walk, gen dirs, locks) and the
    * AbstractFileSystem one (FileContext, which publishPointer's
    * overwriting rename runs through). */
  def register(conf: Configuration): Unit = {
    conf.set("fs.weakfs.impl", classOf[WeakFileSystem].getName)
    conf.set("fs.AbstractFileSystem.weakfs.impl", classOf[WeakAbstractFs].getName)
  }
}

/** The FileContext-side binding: `FileContext.rename(OVERWRITE)`
  * resolves through `fs.AbstractFileSystem.<scheme>.impl`, not the
  * FileSystem cache — delegate straight to [[WeakFileSystem]] (the
  * same pattern as Hadoop's own RawLocalFs). AbstractFileSystem's
  * default overwriting rename deletes the destination and then calls
  * down into [[WeakFileSystem.rename]], so the pausing copy+delete
  * path governs the publish exactly as it would an object store's. */
class WeakAbstractFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new WeakFileSystem(), conf, "weakfs", false)
