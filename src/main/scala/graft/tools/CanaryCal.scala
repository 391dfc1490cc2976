package graft.tools

/** Sample the serial + parallel + latency-chase + storage-latency
  * contention canaries for N seconds — calibrates each kernel's quiet
  * band and catches contention phases the other kernels miss (see
  * graft.Canary.runParallel, runChase and runDisk). */
object CanaryCal {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(60)
    // JIT + page-in all four kernels before any printed sample.
    graft.Canary.run(); graft.Canary.runParallel()
    graft.Canary.runChase(); graft.Canary.runDisk()
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < secs) {
      val s = graft.Canary.run()
      val p = graft.Canary.runParallel()
      val c = graft.Canary.runChase()
      val d = graft.Canary.runDisk()
      println(f"[canary] serial ${s}%.3f  parallel ${p}%.3f  " +
        f"chase ${c}%.3f  disk ${d}%.3f")
      Thread.sleep(2000)
    }
  }
}
