package graft.tools

/** Deliberate memory-subsystem co-tenant for canary validation
  * (r15 verdict ask #1's A/B): saturates a chosen axis of the memory
  * hierarchy so tools/canary_chase_validation.sh can show the
  * latency-chase kernel dilating under contention the stream kernels
  * barely notice.
  *
  * Modes:
  *  - `randread` (default): each thread issues INDEPENDENT random
  *    64-byte reads over its own large array (LCG-indexed, no load
  *    dependency, so the core keeps its full miss-level parallelism
  *    outstanding). Aggregate: hundreds of in-flight random DRAM
  *    requests — maximal controller-queue / row-buffer pressure at
  *    modest bandwidth. This is the latency-thrash co-tenant: a
  *    DEPENDENT chaser sees every queue-induced nanosecond, while a
  *    sequential prefetched stream mostly does not.
  *  - `stream`: each thread rewrites its array sequentially — the
  *    classic bandwidth hog (the r12 canary_validation.sh class).
  *
  * Runs until killed. Usage: MemHog [mode] [threads] [MiB-per-thread]. */
object MemHog {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("randread")
    val threads = args.lift(1).map(_.toInt).getOrElse(16)
    val mib = args.lift(2).map(_.toInt).getOrElse(512)
    val words = (mib.toLong << 20) / 8
    require(words > 0 && (words & (words - 1)) == 0,
      s"MiB-per-thread must make a power-of-two word count, got $mib")
    val mask = words - 1
    @volatile var sink = 0L
    System.err.println(s"[memhog] $mode x$threads, $mib MiB each")
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val a = new Array[Long](words.toInt)
        var i = 0
        while (i < a.length) { a(i) = i.toLong; i += 1 }
        var acc = 0L
        var x = 0x9E3779B97F4A7C15L * (t + 1)
        mode match {
          case "randread" =>
            // 4 independent LCG streams: the address chains advance
            // in parallel, so the core keeps its full miss-level
            // parallelism outstanding instead of serializing on one
            // LCG's latency.
            var x2 = x + 0x632BE59BD9B4E019L
            var x3 = x + 0x2545F4914F6CDD1DL
            var x4 = x + 0x9E3779B97F4A7C15L
            while (true) {
              var k = 0
              while (k < (1 << 18)) {
                x = x * 6364136223846793005L + 1442695040888963407L
                x2 = x2 * 6364136223846793005L + 1442695040888963407L
                x3 = x3 * 6364136223846793005L + 1442695040888963407L
                x4 = x4 * 6364136223846793005L + 1442695040888963407L
                acc += a(((x >>> 17) & mask).toInt) +
                  a(((x2 >>> 17) & mask).toInt) +
                  a(((x3 >>> 17) & mask).toInt) +
                  a(((x4 >>> 17) & mask).toInt)
                k += 1
              }
              sink = acc
            }
          case "stream" =>
            while (true) {
              var i = 0
              while (i < a.length) { a(i) += 1L; i += 1 }
              sink = a(0)
            }
          case other =>
            throw new IllegalArgumentException(s"unknown mode $other")
        }
      })
      th.setDaemon(false)
      th.start(); th
    }
    ts.foreach(_.join())
  }
}
