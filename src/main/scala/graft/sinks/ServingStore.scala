package graft.sinks

/** Fit-once / reload-per-cycle orchestration over [[ModelStore]] —
  * the piece that turns "a fitted dim can be persisted" into "the
  * registered serving queries never refit": a store root is keyed by
  * a caller-chosen key (the data directory, plus a family suffix when
  * one corpus feeds several stores), and the fit closure runs only
  * when the CONTENT FINGERPRINT of the declared input paths does not
  * match the current generation's. (The reference re-derives its
  * RocksDB maps per Airflow run; this is the
  * keep-until-the-dump-changes version of that contract.)
  *
  * GENERATIONS (round 11): every fit lands in its own
  * fingerprint-stamped subdirectory `gen-<fp>/` and is published by
  * atomically renaming a one-line `CURRENT` pointer file onto the
  * root — so a reader NEVER observes a half-swapped store: it either
  * resolves the old pointer (whose generation stays on disk, complete
  * and immutable) or the new one (only written after the generation's
  * every dim is fully saved). The retirement policy keeps exactly one
  * superseded generation (the [[ModelStore]] `.__prev__` convention,
  * store-wide); a reader must re-resolve via [[ensure]] each cycle —
  * holding a resolved path across MORE than one corpus swap may read
  * a retired generation's deleted files, the documented caveat.
  *
  * The fingerprint covers, per file under each input path: relative
  * path, size, mtime, and a CONTENT SIGNAL (md5 of the first+last
  * 64 KiB; whole file when ≤ 128 KiB) — so a same-size rewrite within
  * one mtime granule still flips the fingerprint (a parquet rewrite
  * virtually always changes the footer in the tail block; a rewrite
  * preserving size, mtime granule, AND both boundary blocks remains
  * undetected, the residual documented trade). It is computed UNDER
  * the cross-process lock and re-checked AFTER the fit returns: if
  * the inputs changed while fitting, the generation describes data
  * that no longer exists — publication is refused (the torn
  * generation is deleted, the previous one keeps serving) and the
  * caller gets the error instead of a silently-stale store.
  *
  * Concurrency: a JVM-wide per-root monitor serializes callers
  * in-process, and an OS-level file lock serializes fit-and-publish
  * across processes (a bench concurrent with a test run over the
  * shared default root) — the fingerprint is re-checked under the
  * lock so the second writer becomes a no-op. A crash mid-fit leaves
  * an unpublished `gen-*` directory (garbage-collected by the next
  * successful publish) and `CURRENT` untouched — the next ensure
  * refits; nothing half-written is ever served.
  */
object ServingStore {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Store root for `key` (override the base with GRAFT_MODEL_DIR).
    * The sanitized key keeps roots human-readable; the md5 suffix
    * keeps DISTINCT keys distinct — sanitization is lossy ("/d/sf0 1"
    * and "/d/sf0_1" collapse), and two keys sharing a root would
    * fingerprint-thrash a full refit into every ensure. */
  def rootFor(key: String): String = {
    val base = sys.env.getOrElse("GRAFT_MODEL_DIR",
      sys.props("java.io.tmpdir") + "/graft_models")
    base + "/" + key.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      md5hex(key).take(12)
  }

  // Content signals are recomputed on EVERY fingerprint pass — never
  // memoized. An earlier draft cached them per (path, size, mtime),
  // but that key is precisely the triple the signal exists to
  // distrust: an mtime-preserving same-size rewrite (cp -p / tar /
  // touch -r deploys) of a settled input would hit the stale cache
  // entry and serve the old generation forever within the JVM
  // (round-11 second-review finding). Two bounded 64-KiB page-cached
  // reads + md5 per input file are well under a millisecond — noise
  // next to the stat walk and the Spark jobs around it.

  /** First+last-64-KiB md5 (whole file ≤ 128 KiB) — the cheap content
    * signal that catches same-size same-mtime-granule rewrites; two
    * bounded reads per file, never a full scan of a corpus-sized
    * input. */
  private def contentSignal(f: java.nio.file.Path,
                            size: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val block = 65536
    val ch = java.nio.channels.FileChannel.open(
      f, java.nio.file.StandardOpenOption.READ)
    try {
      def digest(pos: Long, len: Int): Unit = {
        val buf = java.nio.ByteBuffer.allocate(len)
        var p = pos
        while (buf.hasRemaining) {
          val n = ch.read(buf, p)
          if (n < 0) return else p += n
        }
        buf.flip(); md.update(buf)
      }
      if (size <= 2L * block) digest(0L, size.toInt)
      else { digest(0L, block); digest(size - block, block) }
    } finally ch.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def fingerprintOf(version: String, inputs: Seq[String]): String = {
    val parts = inputs.flatMap { in =>
      val p = java.nio.file.Paths.get(in)
      if (!java.nio.file.Files.exists(p)) Seq(s"$in:absent")
      else {
        val walk = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map { f =>
              val size = java.nio.file.Files.size(f)
              val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
              val sig = contentSignal(f, size)
              s"${p.relativize(f)}:$size:$mtime:$sig"
            }
            .toSeq.sorted
        } finally walk.close()
      }
    }
    md5hex(version + "\n" + parts.mkString("\n"))
  }

  // In-process serialization is PER ROOT, not object-wide: a single
  // monitor would park a cheap already-current fingerprint check for
  // an unrelated store behind another store's minutes-long fit (or
  // behind a blocking OS lock wait).
  private val rootMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def genDirName(fp: String) = s"gen-$fp"

  /** The generation `CURRENT` points at, when it exists on disk —
    * resolution a reader can trust mid-swap: the pointer flips
    * atomically and only ever names fully-published generations. */
  private def currentGen(root: java.nio.file.Path): Option[String] = {
    val cur = root.resolve("CURRENT")
    if (!java.nio.file.Files.exists(cur)) None
    else {
      val name = new String(
        java.nio.file.Files.readAllBytes(cur), "UTF-8").trim
      Some(name).filter(n => n.nonEmpty &&
        java.nio.file.Files.isDirectory(root.resolve(n)))
    }
  }

  /** Ensure the store for `key` is current for `inputs` at `version`,
    * running `fit(genDir)` (which should [[ModelStore]]-save every dim
    * under the passed GENERATION directory) only when it is not.
    * Returns the current generation directory — callers load dims
    * from `<returned>/<dim>` exactly as before; only the path now
    * carries the fingerprint. Bump `version` whenever the dim set or
    * any fit definition changes — stale caches refit instead of
    * failing on a missing or drifted dim. */
  def ensure(key: String, inputs: Seq[String], version: String)
            (fit: String => Unit): String =
    rootMonitors.computeIfAbsent(rootFor(key), _ => new Object)
      .synchronized {
    val root = java.nio.file.Paths.get(rootFor(key))
    val fp0 = fingerprintOf(version, inputs)
    def pathOfCurrent(): Option[String] =
      currentGen(root).filter(_ == genDirName(fp0))
        .map(n => root.resolve(n).toString)
    pathOfCurrent() match { case Some(p) => return p case None => () }
    java.nio.file.Files.createDirectories(root)
    val lockCh = java.nio.channels.FileChannel.open(
      root.resolve("_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      // Re-fingerprint under the lock: the inputs may have changed
      // while we queued behind another process's fit, and a
      // lock-winner may already have published OUR generation.
      val fp = fingerprintOf(version, inputs)
      val gen = genDirName(fp)
      val genPath = root.resolve(gen)
      if (!currentGen(root).contains(gen)) {
        val prevGen = currentGen(root)
        // A crashed earlier fit may have left a partial directory at
        // this exact generation — never publish it half-written.
        deleteRecursively(genPath)
        java.nio.file.Files.createDirectories(genPath)
        fit(genPath.toString)
        // Post-fit re-stat: publishing a generation stamped with a
        // fingerprint the fit did not actually read would serve a
        // torn store as current — refuse, clean up, and let the next
        // ensure fit the settled inputs.
        val fpAfter = fingerprintOf(version, inputs)
        if (fpAfter != fp) {
          deleteRecursively(genPath)
          throw new IllegalStateException(
            s"ServingStore: inputs under ${inputs.mkString(", ")} changed " +
              "while the fit was running — the fitted generation does not " +
              "describe the data on disk and was discarded; re-run ensure " +
              "once the inputs settle")
        }
        // Atomic publish: write the pointer beside CURRENT, then
        // rename onto it — readers see the old complete generation or
        // the new complete one, never a mix.
        val tmp = root.resolve("CURRENT.tmp")
        java.nio.file.Files.write(tmp, (gen + "\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, root.resolve("CURRENT"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // Retirement: keep the one superseded generation (in-flight
        // readers of the last cycle), drop anything older — including
        // crashed fits' unpublished directories.
        val keep = Set(gen) ++ prevGen
        val ls = java.nio.file.Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("gen-") &&
              !keep(p.getFileName.toString))
            .foreach(deleteRecursively)
        } finally ls.close()
      }
      genPath.toString
    } finally { lock.release(); lockCh.close() }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
}
