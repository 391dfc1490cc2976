package graft.tools

/** Calibrates the latency-chase canary's working-set size: prints
  * ns-per-dependent-load for a range of array sizes so the kernel can
  * be sized to sit INSIDE this host's effective LLC share (quiet =
  * cache-hit latency, contended = evicted to DRAM — the dilation
  * ratio IS the signal; see graft.Canary.runChase). The advertised
  * LLC size is not trustworthy under virtualization — measure. */
object ChaseCal {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    @volatile var sink = 0L
    for (mb <- Seq(2, 4, 8, 16, 24, 32, 48, 64, 128)) {
      val words = (mb << 20) / 4
      val stride = 9973
      val a = new Array[Int](words)
      var i = 0
      while (i < words) { a(i) = (i + stride) % words; i += 1 }
      val steps = 2 << 20
      // Warm with a FULL permutation cycle (`words` iterations), as
      // Canary.runChase does — a fixed-`steps` warm pass (the r16
      // form) touches only a fraction of the larger sweep sizes'
      // slots, so their timed region folded page-in/compulsory
      // misses into the ns/load used to place the LLC boundary
      // (r16 ADVICE). A full cycle visits every slot exactly once,
      // so each timed pass measures steady state at every size.
      var j = 0
      var s = 0
      while (s < words) { j = a(j); s += 1 }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        var k = 0
        while (k < steps) { j = a(j); k += 1 }
        sink += j
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[chase] ${mb}%4d MiB  ${best}%.4f s  ${best * 1e9 / steps}%.1f ns/load")
    }
  }
}
