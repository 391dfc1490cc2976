package graft

/** Named sub-region wall-clock accumulator — the mechanism behind the
  * bench artifact's `fit_s` column (r14 verdict ask #5).
  *
  * Problem it solves: the self-contained incremental operators (d16,
  * b4, b5 — and d7, which IS its fit) fit a corpus-sized model
  * in-shot by contract, so their single wall number conflates the
  * amortizable fit with the per-cycle delta work and a reader cannot
  * attribute a regression to either half. The fits are EAGER (the
  * iterative operators cut() per round, executing jobs at
  * plan-construction time), so a registered body can wrap its fit
  * call in [[region]] and the elapsed seconds land here; Bench drains
  * the accumulator around each timed shot and publishes the per-query
  * map as `fit_s`.
  *
  * Semantics: wall seconds of the region BODY's execution, summed
  * over all regions recorded since the last [[drain]]. Only EAGER
  * work is attributable — wrapping a lazily-built frame would record
  * plan-construction time (microseconds) while the real execution
  * happens inside the consumer's action; callers must only wrap
  * regions whose body executes jobs (the cut()-per-round iterative
  * fits do). Thread-safe: concurrent regions accumulate via
  * DoubleAdder; the drain is a snapshot-then-clear (regions still
  * running at drain time land in the NEXT drain — Bench drains
  * before t0 so stale regions from a failed previous shot cannot
  * leak into a measurement).
  *
  * Zero overhead when nothing reads it (two nanoTime calls and one
  * adder update per region) — the registered queries stay
  * instrumentation-light and Verify/tests run the same bodies
  * unchanged.
  */
object Timed {
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.DoubleAdder]()

  def region[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally acc
      .computeIfAbsent(name,
        _ => new java.util.concurrent.atomic.DoubleAdder())
      .add((System.nanoTime() - t0) / 1e9)
  }

  /** Snapshot every accumulated region and clear the registry. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val snap = acc.asScala.map { case (k, v) => k -> v.sum() }.toMap
    acc.clear()
    snap
  }
}
