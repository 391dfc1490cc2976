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
}
