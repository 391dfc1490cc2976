package graft.tools

/** Deliberate storage-latency co-tenant for disk-canary validation
  * (r16 verdict ask #1's A/B): saturates the volume's fsync/journal
  * path so tools/disk_canary_validation.sh can show the
  * storage-latency kernel (graft.Canary.runDisk) dilating under
  * contention the three memory kernels barely notice — the quadrant
  * that dilated the r16 driver's d19 shot (145.5 s wall, all memory
  * canaries quiet, 1-task checkpoint stages at wall ≫ cpu).
  *
  * Each thread owns a small ring file (default 8 MiB — bounded disk
  * footprint, runs forever without filling the volume) and loops:
  * write one 64 KiB block at the ring cursor, fsync. On ext4 every
  * force serializes through the shared journal, so a handful of
  * threads keep the commit machinery continuously busy and every
  * OTHER process's fsync queues behind them — latency contention,
  * not bandwidth (aggregate write rate is a few hundred MB/s of
  * re-written blocks, far below the host throttling cliff the
  * randread memory hogs trip; see the r16 contention playbook).
  *
  * Runs until killed. Usage: DiskHog [threads] [MiB-per-file] [dir].
  */
object DiskHog {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(4)
    val mib = args.lift(1).map(_.toInt).getOrElse(8)
    val dir = args.lift(2).getOrElse(System.getProperty("java.io.tmpdir"))
    val ringBytes = mib.toLong << 20
    val block = new Array[Byte](64 << 10)
    var i = 0
    while (i < block.length) { block(i) = ((i * 131) ^ (i >> 7)).toByte; i += 1 }
    System.err.println(s"[diskhog] x$threads, $mib MiB ring each, dir=$dir")
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val f = java.nio.file.Files.createTempFile(
          java.nio.file.Paths.get(dir), s"graft_diskhog_${t}_", ".bin")
        f.toFile.deleteOnExit()
        val ch = java.nio.channels.FileChannel.open(f,
          java.nio.file.StandardOpenOption.WRITE)
        var pos = 0L
        while (true) {
          val buf = java.nio.ByteBuffer.wrap(block)
          while (buf.hasRemaining) ch.write(buf, pos + buf.position())
          ch.force(false)
          pos += block.length
          if (pos >= ringBytes) pos = 0L
        }
      })
      th.setDaemon(false)
      th.start(); th
    }
    ts.foreach(_.join())
  }
}
