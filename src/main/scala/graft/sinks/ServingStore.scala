package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

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
  * FILESYSTEM SUBSTRATE (round 12): every path operation — the
  * fingerprint walk, the `CURRENT` pointer, generation directories,
  * retirement — goes through the Hadoop `FileSystem` API (the same
  * substrate [[ModelStore.save]] already uses), resolved from the
  * active session's `hadoopConfiguration`. So `hdfs://` (or any
  * configured scheme) inputs and roots stat, read, and rename exactly
  * like local ones, and an input whose scheme has NO registered
  * filesystem FAILS `ensure` loudly instead of silently fingerprinting
  * as absent — the round-11 staleness hazard: under the old
  * `java.nio` walk an `s3://` input was permanently "absent", so the
  * store fitted once and then served stale dims forever. Residual
  * object-store caveats are documented on [[ensure]].
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
  * a retired generation's deleted files, the documented caveat
  * (pinned executable in ServingStoreSpec). A TIME-based retirement
  * guard (keep generations younger than some min age regardless of
  * count) was considered and declined: it would protect only readers
  * already violating the re-resolve-per-cycle contract, at the price
  * of unbounded disk growth under bursty refits — the keep-one
  * policy's worst case is exactly two live generations.
  *
  * The fingerprint covers, per file under each input path: relative
  * path, size, mtime, and a CONTENT SIGNAL (md5 of the first+last
  * 64 KiB; whole file when ≤ 128 KiB) — so a same-size rewrite within
  * one mtime granule still flips the fingerprint (a parquet rewrite
  * virtually always changes the footer in the tail block; a rewrite
  * preserving size, mtime granule, AND both boundary blocks remains
  * undetected, the residual documented trade). A file that VANISHES
  * between the listing and the signal read (an input directory being
  * rewritten underneath us) folds a `vanished` marker into the
  * fingerprint instead of throwing — the next pass over the settled
  * directory then sees a different fingerprint and refits, so a
  * mid-rewrite input degrades to a refit, never an unhandled
  * `FileNotFoundException` out of ensure (round-11 advice). The
  * fingerprint is computed UNDER the cross-process lock and
  * re-checked AFTER the fit returns: if the inputs changed while
  * fitting, the generation describes data that no longer exists —
  * publication is refused (the torn generation is deleted, the
  * previous one keeps serving) and the caller gets the error instead
  * of a silently-stale store.
  *
  * Concurrency: a JVM-wide per-root monitor serializes callers
  * in-process; across processes, a `file:` root takes a real OS
  * `FileChannel` lock (the strongest primitive the substrate offers),
  * and any other scheme uses a LEASE MARKER — an atomic
  * create-exclusive `_LOCK.lease` file (atomic on HDFS) whose age
  * bounds a crashed holder: a waiting fitter polls, and breaks only a
  * lease older than `spark.graft.servingstore.leaseMs` (default 1 h).
  * The lease is crash-recovery, not a correctness proof — a fit that
  * legitimately outlives its lease can be raced, and object stores
  * without atomic create-exclusive (S3 et al.) reduce the marker to
  * advisory. What happens THEN is pinned executable (round 13,
  * ServingStoreSpec over a test-only weak-semantics filesystem):
  * (1) a fitter whose lease was broken-and-superseded re-verifies
  * ownership after its fit returns — BEFORE the generation name even
  * exists, since every fit runs in a holder-unique staging dir
  * (`gen-<fp>.stage-<uuid>`, r13 ADVICE) renamed onto `gen-<fp>` only
  * post-check — and ABANDONS its
  * publish with a loud `IllegalStateException` — only the successor's
  * publish moves `CURRENT`, and the loser's writes can never land in
  * a name the winner publishes; (2) when a weak create-exclusive admits
  * two concurrent fitters outright, both fit but exactly one (the one
  * the on-disk lease names) publishes — the loser abandons, and the
  * root converges on one winning generation; (3) a reader that
  * samples `CURRENT` midway through a NON-ATOMIC (copy+delete)
  * pointer rename resolves "no current generation" — the pointer
  * names a generation only when its bytes are complete and its
  * directory exists — never half-written content. A blocked lease
  * waiter logs the holder's token and lease age on first block and
  * every ~30 s. The residual exposure on weak substrates is therefore
  * a spurious refit or an abandoned publish (both loud, both retried
  * by the next ensure), never silent corruption; the post-fit
  * fingerprint re-check and refuse-torn-publication remain the
  * correctness backstop either
  * way. A crash mid-fit leaves an unpublished `gen-*`
  * directory (garbage-collected by the next successful publish) and
  * `CURRENT` untouched — the next ensure refits; nothing half-written
  * is ever served.
  */
object ServingStore {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Store root for `key` (override the base with GRAFT_MODEL_DIR, or
    * the `graft.model.dir` system property — which may name any
    * Hadoop-resolvable URI, e.g. `hdfs://nn/models`). The sanitized
    * key keeps roots human-readable; the md5 suffix keeps DISTINCT
    * keys distinct — sanitization is lossy ("/d/sf0 1" and "/d/sf0_1"
    * collapse), and two keys sharing a root would fingerprint-thrash
    * a full refit into every ensure. */
  def rootFor(key: String): String = {
    val base = sys.props.get("graft.model.dir")
      .orElse(sys.env.get("GRAFT_MODEL_DIR"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_models")
    base + "/" + key.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      md5hex(key).take(12)
  }

  /** The Hadoop configuration path resolution runs under: the active
    * (or default) session's, so `fs.*` site settings and credentials
    * reach the store exactly as they reach every read/write — a bare
    * `new Configuration()` only for the no-session specs. */
  private def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  // Content signals are recomputed on EVERY fingerprint pass — never
  // memoized. An earlier draft cached them per (path, size, mtime),
  // but that key is precisely the triple the signal exists to
  // distrust: an mtime-preserving same-size rewrite (cp -p / tar /
  // touch -r deploys) of a settled input would hit the stale cache
  // entry and serve the old generation forever within the JVM
  // (round-11 second-review finding). Two bounded 64-KiB reads + md5
  // per input file are well under a millisecond locally and one or
  // two positioned-read RPCs remotely — noise next to the stat walk
  // and the Spark jobs around it.

  /** First+last-64-KiB md5 (whole file ≤ 128 KiB) — the cheap content
    * signal that catches same-size same-mtime-granule rewrites; two
    * bounded positioned reads per file, never a full scan of a
    * corpus-sized input. */
  private def contentSignal(fs: FileSystem, f: Path, size: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val block = 65536
    val in = fs.open(f)
    try {
      def digest(pos: Long, len: Int): Unit = {
        val buf = new Array[Byte](len)
        in.readFully(pos, buf, 0, len)
        md.update(buf)
      }
      if (size <= 2L * block) { if (size > 0) digest(0L, size.toInt) }
      else { digest(0L, block); digest(size - block, block) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** One fingerprint line per file under `in` — or the `absent` /
    * `vanished` markers, each a distinct fingerprint STATE that flips
    * again once the input (re)settles. Unknown schemes throw out of
    * `getFileSystem` — loudly, by design. */
  private[graft] def fingerprintOf(conf: Configuration, version: String,
                                   inputs: Seq[String]): String = {
    val parts = inputs.flatMap { in =>
      val p = new Path(in)
      val fs = p.getFileSystem(conf) // no filesystem for the scheme => throws
      val q = fs.makeQualified(p)
      try {
        if (!fs.exists(q)) Seq(s"$in:absent")
        else {
          val prefix = q.toString
          val it = fs.listFiles(q, true)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val st = it.next()
            val f = st.getPath
            val s = f.toString
            val rel =
              if (s.startsWith(prefix + "/")) s.substring(prefix.length + 1)
              else f.getName // the input IS a regular file
            buf += (try {
              val sig = contentSignal(fs, f, st.getLen)
              s"$rel:${st.getLen}:${st.getModificationTime}:$sig"
            } catch {
              case _: java.io.FileNotFoundException | _: java.io.EOFException =>
                s"$rel:vanished" // deleted/truncated mid-walk: refit next pass
            })
          }
          buf.toSeq.sorted
        }
      } catch {
        // The whole directory vanished between exists() and the walk —
        // same mid-rewrite class as a single file, same degradation.
        case _: java.io.FileNotFoundException => Seq(s"$in:vanished")
      }
    }
    md5hex(version + "\n" + parts.mkString("\n"))
  }

  // In-process serialization is PER ROOT, not object-wide: a single
  // monitor would park a cheap already-current fingerprint check for
  // an unrelated store behind another store's minutes-long fit (or
  // behind a blocking cross-process lock wait).
  private val rootMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def genDirName(fp: String) = s"gen-$fp"

  /** The generation `CURRENT` points at, when it exists on disk —
    * resolution a reader can trust mid-swap: the pointer flips
    * atomically and only ever names fully-published generations. */
  private[graft] def currentGen(fs: FileSystem, root: Path): Option[String] = {
    val cur = new Path(root, "CURRENT")
    try {
      val st = fs.getFileStatus(cur)
      val buf = new Array[Byte](st.getLen.toInt)
      val in = fs.open(cur)
      try in.readFully(0L, buf) finally in.close()
      val name = new String(buf, "UTF-8").trim
      Some(name).filter(n => n.nonEmpty && {
        try fs.getFileStatus(new Path(root, n)).isDirectory
        catch { case _: java.io.FileNotFoundException => false }
      })
    } catch {
      case _: java.io.FileNotFoundException => None
      // A pointer that fails its CHECKSUM read (torn by a non-atomic
      // substrate, or its sidecar gone stale under a foreign writer)
      // is recoverable derived state, not data loss: the generations
      // it points among are immutable and fingerprint-stamped, so the
      // self-healing move is "no current" — the caller refits and
      // REPUBLISHES a clean pointer. Without this arm a corrupt
      // CURRENT wedges every ensure on the root forever (r13,
      // observed live when a checksummed read followed a raw rewrite).
      // Loud, not silent: the WARN names the root.
      case e: org.apache.hadoop.fs.ChecksumException =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"ServingStore: CURRENT at $root failed its checksum read " +
            s"(${e.getMessage}) — treating as no current generation; " +
            "the next fit republishes a clean pointer")
        None
    }
  }

  /** Pointer publish: write beside `CURRENT`, rename onto it.
    * `FileContext.rename(OVERWRITE)` is the Hadoop API's atomic
    * overwriting rename — atomic on HDFS and local filesystems;
    * object stores emulate rename as copy+delete (not atomic), the
    * documented reason their deployments want a single writer. */
  private def publishPointer(conf: Configuration, fs: FileSystem,
                             root: Path, gen: String): Unit = {
    val tmp = new Path(root, "CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write((gen + "\n").getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
    fc.rename(tmp, new Path(root, "CURRENT"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Cross-process mutual exclusion for fit-and-publish. `file:` roots
    * get a real OS file lock; everything else gets the create-exclusive
    * lease marker described in the object scaladoc. */
  private trait StoreLock {
    def release(): Unit
    /** Positive proof this process still owns the root — re-checked by
      * ensure() immediately before the CURRENT publish, so a fit that
      * outlived its lease and was broken-and-superseded ABANDONS its
      * publish instead of racing the successor's pointer swap. The OS
      * file-lock arm cannot be broken while held, so it is always
      * still held; only the lease arm can answer false. */
    def stillHeld(): Boolean = true
  }

  /** Observability seam for the lease-wait path: production logs a
    * WARN (below); the spec swaps in a recorder to pin that a blocked
    * waiter names WHO holds the root. Never influences control flow. */
  @volatile private[graft] var leaseWaitObserver
    : Option[(String, Long) => Unit] = None

  /** A blocked lease waiter is LOUD: once on first block and every
    * ~30 s after, log the holder's token and the lease's age — a
    * wedged-but-alive holder otherwise stalls every waiter silently
    * for up to leaseMs with nothing in any log naming the culprit. */
  private def noteLeaseWait(fs: FileSystem, lease: Path, ageMs: Long): Unit = {
    val holderTok = try {
      val st = fs.getFileStatus(lease)
      val buf = new Array[Byte](math.min(st.getLen, 512L).toInt)
      val in = fs.open(lease)
      try in.readFully(0L, buf) finally in.close()
      new String(buf, "UTF-8").trim
    } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"ServingStore: waiting on lease $lease held by '$holderTok' " +
        s"(age ${ageMs} ms, breaks after ${lockLeaseMs} ms)")
    leaseWaitObserver.foreach(_(holderTok, ageMs))
  }

  // Same active-orElse-default session resolution as hadoopConf(): a
  // configured lease must not silently fall back to the 1 h default
  // just because ensure ran off the session thread.
  private def lockLeaseMs: Long =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption("spark.graft.servingstore.leaseMs"))
      .map(_.toLong).getOrElse(3600000L)

  private def acquireLock(fs: FileSystem, root: Path): StoreLock =
    // The -Dgraft.servingstore.forceLease escape hatch routes a local
    // root through the lease protocol so its break/wait/contention
    // arms are spec-testable (no distributed FS in CI); production
    // local roots always take the stronger OS lock.
    if (fs.getScheme == "file" &&
        !sys.props.contains("graft.servingstore.forceLease")) {
      // POSIX substrate: a real OS lock (blocks until the holder — in
      // any process — releases; the per-root monitor already keeps two
      // threads of THIS JVM from racing into an OverlappingFileLock).
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(root.toUri.getPath, "_LOCK"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lk = ch.lock()
      new StoreLock {
        def release(): Unit = { lk.release(); ch.close() }
      }
    } else {
      val lease = new Path(root, "_LOCK.lease")
      val leaseMs = lockLeaseMs
      // Payload resolved BEFORE the create: a hostname lookup failing
      // AFTER a successful create-exclusive would orphan our own
      // fresh lease and stall this very process a full leaseMs. The
      // payload is a UNIQUE token (hostname + uuid), not just the
      // hostname: release() verifies it, so a holder that outlived
      // its lease and was broken cannot delete the SUCCESSOR's fresh
      // lease on its way out (which would have opened the root to a
      // third fitter — strictly worse than the documented
      // outlived-lease race itself).
      val host: String =
        try java.net.InetAddress.getLocalHost.getHostName
        catch { case scala.util.control.NonFatal(_) => "unknown-host" }
      val holder = host + ":" + java.util.UUID.randomUUID()
      var acquired = false
      var lastWaitNoteNanos = 0L // 0 = not yet blocked; first block logs
      while (!acquired) {
        try {
          // create(overwrite = false) is atomic create-exclusive on
          // HDFS — exactly one contender wins.
          val out = fs.create(lease, false)
          try out.write(holder.getBytes("UTF-8")) finally out.close()
          acquired = true
        } catch {
          // ONLY the contention signal may poll; any other create
          // failure (permissions, dead namenode) propagates — the
          // old FileChannel path surfaced those too, and an unbounded
          // silent retry would hang ensure for the JVM's lifetime.
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            // Held. Break only a lease old enough that its holder
            // must have crashed — and break it ATOMICALLY, by rename
            // to a unique tombstone: two waiters that both judged the
            // same stale lease race the rename, exactly one wins, so
            // the loser can never delete the winner's FRESH lease out
            // from under it (the delete-based break's TOCTOU). The
            // winner removes its tombstone; a breaker crashing in
            // between leaves one never-consulted tombstone file,
            // the accepted debris.
            val age = try
              System.currentTimeMillis() -
                fs.getFileStatus(lease).getModificationTime
            catch { case _: java.io.FileNotFoundException => -1L }
            if (age > leaseMs) {
              val tomb = new Path(root,
                s"_LOCK.break.${java.util.UUID.randomUUID()}")
              if (try fs.rename(lease, tomb)
                  catch { case _: java.io.IOException => false })
                fs.delete(tomb, false)
            } else {
              val now = System.nanoTime()
              if (lastWaitNoteNanos == 0L ||
                  now - lastWaitNoteNanos > 30L * 1000 * 1000 * 1000) {
                noteLeaseWait(fs, lease, math.max(age, 0L))
                lastWaitNoteNanos = now
              }
              Thread.sleep(200)
            }
        }
      }
      new StoreLock {
        // Ownership is provable only POSITIVELY: the lease on disk
        // still carries OUR token. Anything else — successor's token
        // after a break+reacquire, lease gone, any read failure —
        // answers false, and ensure() abandons the publish (the
        // conservative direction: a skipped publish costs one refit;
        // a raced one can tear the successor's CURRENT swap).
        override def stillHeld(): Boolean =
          try {
            val st = fs.getFileStatus(lease)
            val buf = new Array[Byte](st.getLen.toInt)
            val in = fs.open(lease)
            try in.readFully(0L, buf) finally in.close()
            new String(buf, "UTF-8") == holder
          } catch { case scala.util.control.NonFatal(_) => false }
        // Delete only OUR lease: after a break + reacquire the file
        // holds the successor's token and must survive this release
        // (the successor's own release removes it). The read-then-
        // delete window is milliseconds against a leaseMs-scale break
        // horizon — strictly safer than the unconditional delete it
        // replaces, never worse. A lease already gone (broken and
        // released) is a no-op.
        def release(): Unit = {
          // ANY failure to read the payload (gone, checksum error, IO,
          // or a client library's RuntimeException) means ownership is
          // unprovable — leave the lease in place (the stale-break
          // path reclaims it after leaseMs) rather than risk deleting
          // a successor's. Deleting only on a POSITIVE match is the
          // direction that can never make the race worse; stillHeld's
          // NonFatal catch, not just IOException, because an FS client
          // throwing an unchecked error mid-read is still
          // "unprovable", not "propagate and skip the conservative
          // arm".
          if (stillHeld()) fs.delete(lease, false)
          else org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ServingStore: lease at $lease no longer ours on release " +
              "(broken after exceeding leaseMs and reacquired) — leaving " +
              "the successor's lease in place")
        }
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
    val conf = hadoopConf()
    val rootRaw = new Path(rootFor(key))
    val fs = rootRaw.getFileSystem(conf)
    val root = fs.makeQualified(rootRaw)
    val fp0 = fingerprintOf(conf, version, inputs)
    def pathOfCurrent(): Option[String] =
      currentGen(fs, root).filter(_ == genDirName(fp0))
        .map(n => new Path(root, n).toString)
    pathOfCurrent() match { case Some(p) => return p case None => () }
    fs.mkdirs(root)
    val lock = acquireLock(fs, root)
    try {
      // Re-fingerprint under the lock: the inputs may have changed
      // while we queued behind another process's fit, and a
      // lock-winner may already have published OUR generation.
      val fp = fingerprintOf(conf, version, inputs)
      val gen = genDirName(fp)
      val genPath = new Path(root, gen)
      if (!currentGen(fs, root).contains(gen)) {
        val prevGen = currentGen(fs, root)
        // Fit into a HOLDER-UNIQUE staging directory (r13 ADVICE).
        // Fitting directly into gen-<fp> shared that NAME with any
        // successor that broke our lease and fitted the same inputs:
        // after the successor published, the superseded fitter's
        // still-running fit kept writing into files of the LIVE
        // published generation, and the successor's own pre-fit
        // cleanup could clobber the loser's in-flight writes mid-fit
        // — "never silent corruption" then held only when fit() was
        // byte-deterministic per fingerprint. A staging dir suffixed
        // with a fresh UUID is writable by exactly one fitter ever;
        // the published name becomes reachable only through the
        // post-stillHeld rename below.
        val stage = new Path(root, s"$gen.stage-${java.util.UUID.randomUUID()}")
        fs.mkdirs(stage)
        try fit(stage.toString)
        catch { case e: Throwable =>
          // Best-effort sweep of our own debris; retirement also
          // removes stale stage dirs (they match the gen-* prefix and
          // are never in the keep set), so a failed delete here only
          // defers cleanup, never leaks forever.
          try { fs.delete(stage, true); () }
          catch { case scala.util.control.NonFatal(_) => () }
          throw e
        }
        // Post-fit re-stat: publishing a generation stamped with a
        // fingerprint the fit did not actually read would serve a
        // torn store as current — refuse, clean up, and let the next
        // ensure fit the settled inputs.
        val fpAfter = fingerprintOf(conf, version, inputs)
        if (fpAfter != fp) {
          fs.delete(stage, true)
          throw new IllegalStateException(
            s"ServingStore: inputs under ${inputs.mkString(", ")} changed " +
              "while the fit was running — the fitted generation does not " +
              "describe the data on disk and was discarded; re-run ensure " +
              "once the inputs settle")
        }
        // Ownership re-check BEFORE the generation name ever exists: a
        // fit that outlived its lease was broken and superseded — the
        // successor owns the root now, and OUR publish would race its
        // CURRENT swap. Abandon, deleting our own staging dir — it is
        // holder-unique, so the delete cannot touch the successor's
        // generation or staging (under the pre-staging layout the
        // abandoned dir had to be LEFT on disk precisely because it
        // shared the successor's name).
        if (!lock.stillHeld()) {
          try { fs.delete(stage, true); () }
          catch { case scala.util.control.NonFatal(_) => () }
          throw new IllegalStateException(
            s"ServingStore: the lease for $root was broken and " +
              "reacquired while the fit ran (the fit outlived " +
              "spark.graft.servingstore.leaseMs) — abandoning this " +
              "publish; the successor owns the root. Re-run ensure " +
              "once it settles")
        }
        // Move the COMPLETE staging dir onto the generation name. A
        // gen-<fp> already on disk here is either a pre-staging-build
        // crashed fit's partial directory or a complete generation
        // whose pointer swap crashed — both unpublished (the enclosing
        // branch), both replaced. The delete→rename→publish window is
        // milliseconds (no fit inside it); a break landing exactly
        // there degrades to the documented weak-substrate residual — a
        // reader's spurious "no current generation" and a retried
        // ensure — never a half-written generation behind a live
        // pointer, because the rename source is always a COMPLETE fit.
        fs.delete(genPath, true)
        if (!fs.rename(stage, genPath))
          throw new java.io.IOException(
            s"ServingStore: could not rename staging $stage onto " +
              s"$genPath — the fit is complete but unpublished; " +
              "re-run ensure")
        // Atomic publish: readers see the old complete generation or
        // the new complete one, never a mix.
        publishPointer(conf, fs, root, gen)
        // Retirement: keep the one superseded generation (in-flight
        // readers of the last cycle), drop anything older — including
        // crashed fits' unpublished gen directories. Staging dirs are
        // swept only past the lease horizon: a FRESH `.stage-` dir may
        // belong to a live superseded fitter still inside its fit —
        // its writes are its own to delete on abandon (deleting it
        // from here would turn that loud abandon into an arbitrary
        // mid-write crash) — while one older than leaseMs belongs to
        // a holder that crashed (or outlived the lease and is fair
        // game either way): provably-dead debris.
        val keep = Set(gen) ++ prevGen
        val now = System.currentTimeMillis()
        fs.listStatus(root).iterator
          .filter { st =>
            val n = st.getPath.getName
            val stale = now - st.getModificationTime > lockLeaseMs
            (n.startsWith("gen-") && !keep(n) &&
              (!n.contains(".stage-") || stale)) ||
              // A breaker that crashed between its tombstone rename
              // and delete leaves one `_LOCK.break.*` file — harmless
              // (never consulted), swept here once provably dead.
              (n.startsWith("_LOCK.break.") && stale)
          }
          .foreach(st => fs.delete(st.getPath, true))
      }
      genPath.toString
    } finally lock.release()
  }

  /** Read-only warmth probe: does the store for `key` CURRENTLY serve
    * a generation fitted from `inputs` at `version`? One fingerprint
    * pass + one pointer read — never locks, never fits, never mutates.
    * Bench samples this immediately before each serving query's timed
    * region (`store_warm` in bench_out.json), so a serving row whose
    * timed shot absorbed a cold-store fit is self-adjudicating in the
    * artifact instead of indistinguishable from contention (the r13
    * p5 20.6 s-vs-5.3 s ambiguity). */
  def isCurrent(key: String, inputs: Seq[String], version: String): Boolean = {
    val conf = hadoopConf()
    val rootRaw = new Path(rootFor(key))
    val fs = rootRaw.getFileSystem(conf)
    val root = fs.makeQualified(rootRaw)
    currentGen(fs, root)
      .contains(genDirName(fingerprintOf(conf, version, inputs)))
  }
}
