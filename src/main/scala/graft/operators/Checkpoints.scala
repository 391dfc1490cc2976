package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative and multi-consumer intermediates.
  *
  * Every iterative operator in this package (closures, connected
  * components, LSH bucket sets, pair generators) materializes
  * intermediates so the Catalyst plan does not grow with iteration
  * count and shared subplans execute once. The MECHANISM is
  * configurable because Spark's two checkpoint flavors fail
  * differently:
  *
  *  - `localCheckpoint()` (the default here) stores blocks on
  *    executors only. Fast — no distributed-filesystem round-trip —
  *    but the lineage is discarded, so losing ANY executor that holds
  *    a block (dynamic allocation scale-in, spot kill, OOM) fails the
  *    job unrecoverably: Spark cannot recompute what it no longer has
  *    a plan for. Right for local mode and small static clusters.
  *  - Reliable `checkpoint()` writes the blocks to the fault-tolerant
  *    filesystem under `spark.graft.checkpointDir`. One extra
  *    write+read per cut, but executor loss just re-reads the files —
  *    the only safe mode for long iterative jobs on a large cluster
  *    with dynamic allocation.
  *
  * Set `spark.graft.checkpointDir` to an HDFS/S3 path to switch every
  * graft operator to reliable cuts (it is read per cut, so a session
  * can flip it between jobs); leave it unset for local work.
  */
private[graft] object Checkpoints {

  /** Session conf key selecting reliable checkpoints. */
  val confKey = "spark.graft.checkpointDir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(confKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir creates a fresh UUID subdirectory per call —
        // set once per context; the first configured dir wins.
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** `df.cut()` — the call-site form the operators use. */
  implicit class Cuttable(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Checkpoints.cut(df)
  }
}
