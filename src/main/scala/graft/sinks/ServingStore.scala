package graft.sinks

/** Fit-once / reload-per-cycle orchestration over [[ModelStore]] —
  * the piece that turns "a fitted dim can be persisted" into "the
  * registered serving queries never refit": a store root is keyed by
  * a caller-chosen key (the data directory, plus a family suffix when
  * one corpus feeds several stores), and the fit closure runs only
  * when the CONTENT FINGERPRINT of the declared input paths — (file,
  * size, mtime) of every file underneath, hashed together with the
  * caller's store-format version — does not match the root's recorded
  * one. (The reference re-derives its RocksDB maps per Airflow run;
  * this is the keep-until-the-dump-changes version of that contract.)
  *
  * Concurrency: a JVM-wide monitor serializes callers in-process, and
  * an OS-level file lock serializes fit-and-swap across processes (a
  * bench concurrent with a test run over the shared default root) —
  * the fingerprint is re-checked under the lock so the second writer
  * becomes a no-op. Readers overlapping a swap remain ModelStore's
  * documented caveat (serve from versioned paths when readers and
  * writers overlap; each dim's previous generation survives at
  * `.__prev__` regardless). The fingerprint is written LAST, so a
  * crash mid-fit refits on the next ensure instead of serving a
  * half-written store.
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
            .map(f => s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:" +
              s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}")
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

  /** Ensure the store at [[rootFor]]`(key)` is current for `inputs`
    * at `version`, running `fit(root)` (which should [[ModelStore]]-
    * save every dim under the root) only when it is not. Returns the
    * root. Bump `version` whenever the dim set or any fit definition
    * changes — stale caches refit instead of failing on a missing or
    * drifted dim. */
  def ensure(key: String, inputs: Seq[String], version: String)
            (fit: String => Unit): String =
    rootMonitors.computeIfAbsent(rootFor(key), _ => new Object)
      .synchronized {
    val root = rootFor(key)
    val fp = fingerprintOf(version, inputs)
    val fpFile = java.nio.file.Paths.get(root, "_FINGERPRINT")
    def current(): Boolean =
      java.nio.file.Files.exists(fpFile) &&
        new String(java.nio.file.Files.readAllBytes(fpFile), "UTF-8") == fp
    if (current()) return root
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val lockCh = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(root, "_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      if (!current()) {
        fit(root)
        java.nio.file.Files.write(fpFile, fp.getBytes("UTF-8"))
      }
    } finally { lock.release(); lockCh.close() }
    root
  }
}
