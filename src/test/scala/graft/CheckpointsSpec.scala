package graft

import graft.operators.Checkpoints.Cuttable

/** Checkpoint-lifecycle contracts beyond GraphSpec's loop coverage:
  * the unpersist warn-mute's concurrency behavior (round-11 second
  * review — a naive per-call save/restore interleaved across threads
  * could capture another thread's ERROR as its "prior" and stick the
  * RDD logger at ERROR for the JVM lifetime, and restoring a pinned
  * explicit level would detach the logger from later setLogLevel
  * calls; the fix is a depth-counted mute that removes the explicit
  * LoggerConfig when none existed before).
  */
class CheckpointsSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("concurrent uncuts never stick the mute or pin the logger config") {
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    def state: (Boolean, String) = {
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val lc = ctx.getConfiguration.getLoggerConfig(name)
      (lc.getName == name, String.valueOf(lc.getLevel))
    }
    val before = state
    // 8 threads race cut+uncut through the depth-counted mute window;
    // any interleaved save/restore bug surfaces as a leftover explicit
    // ERROR config after the joins.
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try {
          for (j <- 1 to 5) {
            val df = Seq((i, j)).toDF("a", "b").cut()
            df.uncut()
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"concurrent cut/uncut threw: ${failures.peek()}")
    assert(state == before,
      s"mute must leave the logger config exactly as found: " +
        s"before=$before after=$state")
  }

  test("cutCount materializes the cut and returns the count in one job") {
    import org.apache.spark.sql.functions._
    // Count jobs via a listener: the lazy cut + rdd count must submit
    // exactly ONE job (the r16 verdict ask #2 contract — the eager
    // cut + isEmpty pattern it replaces submits two per round).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    ss.sparkContext.addSparkListener(l)
    try {
      // Shuffle-free frame: with AQE every exchange materializes as
      // its own job regardless of cut mode, so the one-job contract
      // is asserted on the cut+count TAIL itself (a plan with N AQE
      // stage jobs runs N+1 with cutCount vs N+2 with the eager
      // cut + isEmpty pattern it replaces).
      val src = ss.range(1000)
        .select(col("id"), (col("id") % 7).as("k"))
        .filter(col("k") =!= 99)
      val (c, n) = graft.operators.Checkpoints.cutCount(src)
      // listenerBus is private[spark]; reflective drain (the Bench
      // drainListenerBus pattern) so the job counter has settled.
      locally {
        val bus = ss.sparkContext.getClass.getMethod("listenerBus")
          .invoke(ss.sparkContext)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .foreach(_.invoke(bus))
      }
      assert(n === 1000L)
      assert(jobs.get() === 1,
        s"cutCount must run exactly one job, ran ${jobs.get()}")
      // The frame is genuinely cut: plan is an RDD scan (no lineage
      // back to the range) and re-reading it is block-backed.
      assert(c.queryExecution.analyzed.collect {
        case _: org.apache.spark.sql.execution.LogicalRDD => 1
      }.nonEmpty, "cutCount result must be a checkpointed LogicalRDD")
      assert(c.count() === 1000L)
      c.uncut()
    } finally ss.sparkContext.removeSparkListener(l)
  }

  test("roundCutEval folds a full aggregate into the materializing job") {
    import org.apache.spark.sql.functions._
    val src = ss.range(100).select(col("id"), col("id").as("comp"))
    val (c, s) = graft.operators.Checkpoints.roundCutEval(src)(
      _.agg(sum(col("comp"))).head().getLong(0))
    assert(s === (0L until 100L).sum)
    // The cut frame must be re-consumable after its INPUT would be
    // gone (lineage truncated): count it again from blocks.
    assert(c.count() === 100L)
    // Round cuts default DISK_ONLY: the persisted level must not
    // occupy the unified storage-memory pool.
    val lvls = c.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel
    }
    assert(lvls.nonEmpty && lvls.forall(l => l.useDisk && !l.useMemory),
      s"roundCutEval must persist DISK_ONLY, got $lvls")
    c.uncut()
  }
}
