package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-robustness probe (r15 verdict ask #2): the testdata's keys
  * are uniform, so ScaleProbe's exponents prove volume-linearity but
  * say nothing about a HOT KEY — and AQE's skew handling rebalances
  * sort-merge JOIN partitions only, not the groupBy aggregates most
  * of the shuffle-heavy family leans on. This probe re-runs each
  * shuffle-heavy family's shape on (a) the uniform sf frame and
  * (b) the SAME row count with a Zipf-head rewrite — one hot key
  * carrying ~10% of all rows (the reference's own distribution note:
  * ~7k collections share one name, filter_duplicates.py — and a hot
  * user / hot label are the event/graph analogues) — and prints, per
  * side, wall + process-CPU + the worst stage's straggler ratio
  * (max task duration / median task duration, stages with >= 8
  * tasks). The adjudication bar from the verdict: a probe whose
  * skewed side shows a straggler task > 10x the stage median needs a
  * fix (salting / two-phase agg / an existing cap), anything under
  * it is handled by the partial-agg combine or AQE.
  *
  * Run one probe per JVM for graded numbers (ScaleProbe's hygiene
  * note applies):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.SkewProbe'           # all probes
  *   sbt 'runMain graft.tools.SkewProbe a6'          # one probe
  *
  * Probed shapes and what they stand for (same replicate-the-shape
  * convention as ScaleProbe; each cites its SURVEY family):
  *  - a6 collect  — per-collection member list (groupBy +
  *    collect_list): NO map-side reduction exists for list building,
  *    every hot-key row lands in one reducer's one buffer.
  *  - a7 topk     — per-collection window top-k: a window partition
  *    is one task's sort run; the hot partition is one task.
  *  - a1 agg      — plain multi-agg groupBy: partial aggregation
  *    combines map-side, the expected-robust control.
  *  - a10 merge   — the REGISTERED name-merge shape: groupBy(name)
  *    with min/sum/count (merging collections sharing a name is an
  *    aggregation, one output row per name) — map-side combine
  *    collapses the hot name to one row per map task.
  *  - a10 pairjoin — the shape a10 is NOT (self-join on name
  *    emitting pairs): quadratic on the hot key by construction,
  *    kept as the negative control — this is what a25's dfCap
  *    exists to prevent.
  *  - a25 capped  — overlapPairs with dfCap=40 on a skewed member
  *    key: the cap's anti-join drops the hot element, so skewed
  *    must read ≈ uniform (the "bounded by an existing cap"
  *    adjudication).
  *  - d16 labels  — the label pull: edge frame joined to a label dim
  *    on the edge's b endpoint, hot b (one super-connected node).
  *  - g1 session  — per-user ordered window (sessionize): hot user.
  */
object SkewProbe {
  /** Per-stage task durations, for the straggler ratio. */
  private final class TaskTally extends org.apache.spark.scheduler.SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        byStage.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(m.executorRunTime)
      }
    }
    def reset(): Unit = byStage.clear()
    /** (ratio, maxMs, medMs, tasks) of the DOMINANT stage — largest
      * summed task run time among stages with >= minTasks. The
      * max-ratio-anywhere variant was measured misleading at probe
      * scale: a near-empty side stage (med 1 ms, max 29 ms) reads
      * "29x" while the stage carrying the actual work reads flat —
      * skew only matters where the time is. */
    def dominantStraggler(minTasks: Int = 8): Option[(Double, Long, Long, Int)] = {
      import scala.jdk.CollectionConverters._
      byStage.asScala.values.flatMap { q =>
        val d = q.asScala.toVector.sorted
        if (d.size < minTasks || d.last == 0L) None
        else {
          val med = math.max(d(d.size / 2), 1L)
          Some((d.sum, (d.last.toDouble / med, d.last, med, d.size)))
        }
      }.maxByOption(_._1).map(_._2)
    }
  }

  def main(args: Array[String]): Unit = {
    val only = args.headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROBE_PARTITIONS (default = cpus): the reduce
    // fan-out, independently of the thread count. The r16 verdict's
    // ask #5: with 32 partitions and a 10% hot key the straggler
    // ratio CAPS at ~3.6x (0.10 / (0.90/32)) — a measurement at the
    // instrument's ceiling cannot separate "combine holds" from
    // "ceiling hit". 256 partitions raise the ceiling to ~29x, so a
    // genuinely super-linear hot group separates from the pack while
    // a group-size-bounded one stays at its absolute hot-task time.
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      // Keep the full reduce fan-out: AQE's partition coalescing
      // merges the sf0.1 probe's small partitions down to 1-4 tasks,
      // which hides exactly the per-task distribution this probe
      // exists to measure (a 100 TB run's partitions are never
      // coalesce-small). Skew-JOIN handling stays ON — that is the
      // mechanism under adjudication for the join-shaped probes.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new TaskTally
    spark.sparkContext.addSparkListener(tally)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // One in ten rows (deterministic hash bucket) is rewritten onto
    // the hot key — the Zipf head. Row COUNT is identical on both
    // sides, only the key distribution moves.
    val HOT = -1L
    def skewKey(df: DataFrame, keyCol: String): DataFrame =
      df.withColumn(keyCol,
        when(pmod(xxhash64(col(keyCol)), lit(10)) === 0, lit(HOT))
          .otherwise(col(keyCol)))

    lazy val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("coll"), col("l_partkey").as("member"),
        col("l_extendedprice").as("score"), col("l_quantity").as("qty"))
      .localCheckpoint()
    lazy val liSkew = skewKey(li, "coll").localCheckpoint()
    lazy val ev = Tables(spark, sfDir, "events")
      .select(col("user_id").as("user"), col("ts"), col("event_type"))
      .localCheckpoint()
    lazy val evSkew = skewKey(ev, "user").localCheckpoint()
    // Name-merge shape: a (coll, name) dim where the skewed side
    // gives one name to ~10% of collections (the reference's "7k
    // collections share a name" note, at probe scale).
    lazy val names = li.select(col("coll")).distinct()
      .withColumn("name", concat(lit("n"), pmod(col("coll"), lit(100000))))
      .localCheckpoint()
    lazy val namesSkew = names
      .withColumn("name",
        when(pmod(xxhash64(col("coll")), lit(10)) === 0, lit("HOT"))
          .otherwise(col("name")))
      .localCheckpoint()
    // Label-pull shape (d16's merge): an edge list joined to a label
    // dim on its b endpoint; the skewed side has one super-connected
    // b carrying 10% of edges.
    lazy val edges = li.select(col("coll").as("a"), col("member").as("b"))
      .localCheckpoint()
    lazy val edgesSkew = skewKey(edges, "b").localCheckpoint()
    lazy val labels = li.select(col("member").as("b")).distinct()
      .withColumn("label", pmod(col("b"), lit(1000)))
      .union(Seq(HOT).toDFb(spark).withColumn("label", lit(0L)))
      .localCheckpoint()

    def win = org.apache.spark.sql.expressions.Window
    val probes: Seq[(String, DataFrame, DataFrame, DataFrame => DataFrame)] = Seq(
      ("a6 collect", li, liSkew,
        (d: DataFrame) => d.groupBy("coll")
          .agg(sort_array(collect_list(col("member"))).as("ms"))),
      ("a7 topk", li, liSkew,
        (d: DataFrame) => d.withColumn("rk",
            row_number().over(win.partitionBy("coll").orderBy(col("score").desc)))
          .filter(col("rk") <= 10)),
      ("a1 agg", li, liSkew,
        (d: DataFrame) => d.groupBy("coll").agg(
          count(lit(1)).as("n"), sum("qty").as("sq"),
          avg("score").as("as"), max("member").as("mm"))),
      ("a10 merge", names, namesSkew,
        (d: DataFrame) => d.groupBy("name").agg(
          min(col("coll")).as("stable_id"),
          count(lit(1)).as("merged_count"))),
      ("a10 pairjoin", names, namesSkew,
        (d: DataFrame) => d.join(
            d.select(col("name"), col("coll").as("coll2")), "name")
          .filter(col("coll") < col("coll2"))
          .groupBy("name").agg(count(lit(1)).as("pairs"))),
      ("a25 capped", li, skewKey(li, "member"),
        (d: DataFrame) => graft.operators.Relational.overlapPairs(
          d.select(col("coll").as("c"), col("member").as("m"))
            .localCheckpoint(),
          "c", "m", dfCap = 40L, boundedDf = true)),
      ("d16 labels", edges, edgesSkew,
        (d: DataFrame) => d.join(labels, "b")
          .groupBy("a").agg(min("label").as("lbl"))),
      ("g1 session", ev, evSkew,
        (d: DataFrame) => d.withColumn("prev",
            lag(col("ts"), 1).over(win.partitionBy("user").orderBy("ts")))
          .withColumn("newSess",
            when(col("prev").isNull ||
              col("ts").cast("long") - col("prev").cast("long") > 1800, 1)
              .otherwise(0))
          .withColumn("sess",
            sum(col("newSess")).over(win.partitionBy("user").orderBy("ts")))
          .groupBy("user", "sess").agg(count(lit(1)).as("n"))))

    val selected = probes.filter { case (n, _, _, _) =>
      only.forall(o => o.split('-').forall(n.contains))
    }
    require(selected.nonEmpty,
      s"no probe matches '${only.getOrElse("")}'; names: " +
        probes.map(_._1).mkString(", "))

    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def cpuTimed[A](f: => A): (Double, Double) = {
      val c0 = osBean.map(_.getProcessCpuTime)
      val t0 = System.nanoTime()
      f
      ((System.nanoTime() - t0) / 1e9,
        osBean.zip(c0).map { case (b, c) => (b.getProcessCpuTime - c) / 1e9 }
          .getOrElse(-1.0))
    }

    graft.Canary.run(); graft.Canary.runParallel() // JIT, untimed
    for ((name, uni, skw, body) <- selected) {
      // Settle the async listener bus so the straggler tally sees
      // every task of the action that just returned (the Bench
      // drain, degraded to a bounded sleep if the reflective call is
      // unavailable).
      def drainBus(): Unit = try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .map { m => m.invoke(bus); () }
          .getOrElse(Thread.sleep(500))
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(500) }
      def side(label: String, in: DataFrame): (Double, Double, String) = {
        noop(body(in)) // warm (JIT/codegen), untimed
        System.gc(); Thread.sleep(800)
        drainBus()
        tally.reset()
        val (w, c) = cpuTimed(noop(body(in)))
        drainBus()
        val s = tally.dominantStraggler().map { case (r, mx, md, n) =>
          f"straggler ${r}%5.1fx (max ${mx}ms med ${md}ms n=$n)"
        }.getOrElse("straggler n/a")
        (w, c, s)
      }
      val c1 = graft.Canary.run()
      val (uw, uc, us) = side("uniform", uni)
      val (sw, sc, ss) = side("skewed", skw)
      val c2 = graft.Canary.run()
      println(f"[skew] $name%-12s parts=$parts%-4s uniform ${uw}%6.2f s cpu ${uc}%6.2f [$us]   " +
        f"skewed ${sw}%6.2f s cpu ${sc}%6.2f [$ss]   wallratio ${sw / uw}%4.2f" +
        f"   canary_max ${math.max(c1, c2)}%.3f")
    }
    spark.stop()
  }

  /** Seq[Long] -> single-column DataFrame("b") without importing
    * spark.implicits at the call site. */
  private implicit final class LongSeqOps(private val xs: Seq[Long]) extends AnyVal {
    def toDFb(spark: SparkSession): DataFrame = {
      import spark.implicits._
      xs.toDF("b")
    }
  }
}
