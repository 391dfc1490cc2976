package graft.tools

/** Sample the serial + parallel contention canaries for N seconds —
  * calibrates the parallel kernel's quiet band and catches contention
  * phases the serial kernel misses (see graft.Canary.runParallel). */
object CanaryCal {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(60)
    graft.Canary.run(); graft.Canary.runParallel() // JIT + page-in
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < secs) {
      val s = graft.Canary.run()
      val p = graft.Canary.runParallel()
      println(f"[canary] serial ${s}%.3f  parallel ${p}%.3f  ratio ${p / s}%.2f")
      Thread.sleep(2000)
    }
  }
}
