package graft

import graft.streaming.{SessionEvent, SessionOut, Sessions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Structured Streaming specs: the stateful sessionizer and the
  * watermarked tumbling counts, driven by MemoryStream micro-batches.
  *
  * Each addData is followed by processAllAvailable so the event-time
  * watermark advances between micro-batches (the watermark used by
  * batch N is computed from batch N-1's data). Assertions only claim
  * emissions that are certain under that schedule — Spark may or may
  * not append one extra timeout-only batch after the last watermark
  * advance, so "still open" is only asserted where the final watermark
  * provably hasn't reached the session's gap horizon.
  */
class StreamingSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessionizer closes a session on gap and emits timed-out sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessions.sessionize(input.toDS(), gapSec = 1800L,
      watermarkDelay = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // Batch 1: user 1 gets two events 100s apart; user 2 one event.
      input.addData(
        SessionEvent(1L, 1L, ts(1000)), SessionEvent(1L, 2L, ts(1100)),
        SessionEvent(2L, 3L, ts(1050)))
      query.processAllAvailable()
      // Batch 2: user 1 again, 10000s later — past the gap, so the
      // first session closes inline (gap path, no watermark needed).
      input.addData(SessionEvent(1L, 4L, ts(11100)))
      query.processAllAvailable()
      // Batch 3: unrelated user; processed with watermark 11090, which
      // is past user 2's gap horizon (1050 + 1800), firing its timeout.
      input.addData(SessionEvent(3L, 5L, ts(20000)))
      query.processAllAvailable()
      val rows = spark.table("sessions_out").as[SessionOut].collect().toSet
      assert(rows.contains(SessionOut(1L, 1000L, 1100L, 2L)),
        s"expected user 1's first session closed via gap, got $rows")
      assert(rows.contains(SessionOut(2L, 1050L, 1050L, 1L)),
        s"expected user 2's session emitted via event-time timeout, got $rows")
      // User 3's session (horizon 21800) is past the final watermark
      // (at most 19990) — must still be open.
      assert(!rows.exists(_.user_id == 3L), s"user 3 should be open, got $rows")
    } finally query.stop()
  }

  test("sessionizer state survives a checkpointed restart: recovery ≡ uninterrupted run") {
    // The serving property that makes flatMapGroupsWithState
    // trustworthy in production: stop a checkpointed stream MID-flight
    // (open sessions live only in the state store), restart from the
    // same checkpoint, and the output must equal an uninterrupted run
    // — sessions opened before the stop must finalize AFTER it from
    // RECOVERED state (their source offsets are committed, so a lost
    // state store could never rebuild them by reprocessing).
    // The sink is a parquet FILE sink — the fault-tolerant sink class
    // this property exists for (the memory sink rejects checkpoint
    // recovery outright, and its table would not survive the restart
    // anyway).
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val input = MemoryStream[SessionEvent]
    val out = Sessions.sessionize(input.toDS(), gapSec = 1800L,
      watermarkDelay = "10 seconds")
    def start() = out.writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    var query = start()
    val restarted =
      try {
        // Phase 1: open sessions for users 1 and 2; nothing emits yet.
        input.addData(
          SessionEvent(1L, 1L, ts(1000)), SessionEvent(1L, 2L, ts(1100)),
          SessionEvent(2L, 3L, ts(1050)))
        query.processAllAvailable()
        query.stop() // mid-stream: open sessions exist only as state
        // Phase 2: recover, then close user 1's first session via the
        // gap rule and user 2's via event-time timeout.
        query = start()
        input.addData(SessionEvent(1L, 4L, ts(11100)))
        query.processAllAvailable()
        input.addData(SessionEvent(3L, 5L, ts(20000)))
        query.processAllAvailable()
        spark.read.parquet(outDir).as[SessionOut].collect().toSet
      } finally query.stop()
    // Pre-stop events finalized post-restart — recovered, not rebuilt.
    assert(restarted.contains(SessionOut(1L, 1000L, 1100L, 2L)),
      s"user 1's pre-restart session must close from recovered state, got $restarted")
    assert(restarted.contains(SessionOut(2L, 1050L, 1050L, 1L)),
      s"user 2's pre-restart session must time out from recovered state, got $restarted")
    // Full equality with an uninterrupted run of the same schedule.
    val input2 = MemoryStream[SessionEvent]
    val out2 = Sessions.sessionize(input2.toDS(), gapSec = 1800L,
      watermarkDelay = "10 seconds")
    val q2 = out2.writeStream.format("memory").queryName("restart_ref")
      .outputMode("append").start()
    val uninterrupted =
      try {
        input2.addData(
          SessionEvent(1L, 1L, ts(1000)), SessionEvent(1L, 2L, ts(1100)),
          SessionEvent(2L, 3L, ts(1050)))
        q2.processAllAvailable()
        input2.addData(SessionEvent(1L, 4L, ts(11100)))
        q2.processAllAvailable()
        input2.addData(SessionEvent(3L, 5L, ts(20000)))
        q2.processAllAvailable()
        spark.table("restart_ref").as[SessionOut].collect().toSet
      } finally q2.stop()
    assert(restarted == uninterrupted,
      s"recovered run diverged from uninterrupted: $restarted vs $uninterrupted")
  }

  test("sessionizer matches the batch g1 logic on in-gap events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessions.sessionize(input.toDS(), gapSec = 1800L,
      watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("sessions_batch_eq")
      .outputMode("append").start()
    try {
      // Unordered within the batch — the sessionizer must sort.
      input.addData(
        SessionEvent(7L, 2L, ts(2000)), SessionEvent(7L, 1L, ts(500)),
        SessionEvent(7L, 3L, ts(3500)))
      query.processAllAvailable()
      // Advance the watermark past user 7's horizon (3500 + 1800), then
      // run one more batch so the timeout fires under that watermark.
      input.addData(SessionEvent(8L, 9L, ts(100000)))
      query.processAllAvailable()
      input.addData(SessionEvent(9L, 10L, ts(100001)))
      query.processAllAvailable()
      val rows = spark.table("sessions_batch_eq").as[SessionOut].collect().toSet
      assert(rows.contains(SessionOut(7L, 500L, 3500L, 3L)),
        s"chained in-gap events should form one session, got $rows")
    } finally query.stop()
  }

  test("late cross-batch events merge backwards or form their own session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessions.sessionize(input.toDS(), gapSec = 100L,
      watermarkDelay = "2 hours") // generous watermark: late events stay valid
    val query = out.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // Batch 1 opens session [1000, 1000].
      input.addData(SessionEvent(1L, 1L, ts(1000)))
      query.processAllAvailable()
      // Batch 2 delivers: a late event at 950 (within gap of the open
      // session's start — must merge backwards, start becomes 950), and
      // two late events at 500/560 (own gap-chained session far before
      // the open one).
      input.addData(SessionEvent(1L, 2L, ts(950)),
        SessionEvent(1L, 3L, ts(500)), SessionEvent(1L, 4L, ts(560)))
      query.processAllAvailable()
      // Push the watermark far ahead so everything flushes.
      input.addData(SessionEvent(2L, 9L, ts(20000)))
      query.processAllAvailable()
      input.addData(SessionEvent(2L, 10L, ts(40000)))
      query.processAllAvailable()
      val rows = spark.table("late_out").as[SessionOut]
        .collect().filter(_.user_id == 1L).toSet
      assert(rows.contains(SessionOut(1L, 500L, 560L, 2L)),
        s"late events should gap-chain into their own session, got $rows")
      assert(rows.contains(SessionOut(1L, 950L, 1000L, 2L)),
        s"late event within gap of start should merge backwards, got $rows")
    } finally query.stop()
  }

  test("streaming funnel reaches stages like the batch DP, three-long state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.streaming.FunnelEvent]
    val out = graft.streaming.Sessions.funnelStages(input.toDS())
    val query = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    import graft.streaming.{FunnelEvent => FE, FunnelStage => FS}
    try {
      // Batch 1: u1's click arrives at es=50 BEFORE any view — it must
      // not count; u1's view lands at 100, u2's at 10.
      input.addData(FE(1L, 1L, "view", ts(100)), FE(1L, 2L, "click", ts(50)),
        FE(2L, 3L, "view", ts(10)))
      query.processAllAvailable()
      // Batch 2: u1's purchase(150) sorts BEFORE click(200) in event
      // time — at its turn no valid click exists, so only the click
      // advances (stage 2 at 200).
      input.addData(FE(1L, 4L, "purchase", ts(150)), FE(1L, 5L, "click", ts(200)))
      query.processAllAvailable()
      // Batch 3: u1 completes; u2's click at es=5 precedes its view.
      input.addData(FE(1L, 6L, "purchase", ts(300)), FE(2L, 7L, "click", ts(5)))
      query.processAllAvailable()
      val rows = spark.table("funnel_out").as[FS].collect().toSet
      assert(rows == Set(FS(1L, 1, 100L), FS(1L, 2, 200L), FS(1L, 3, 300L),
        FS(2L, 1, 10L)), s"got $rows")
    } finally query.stop()
  }

  test("streaming anomaly scores match the batch g8 DP under in-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{WindowCount => WC, WindowScore => WS}
    // Real window counts from the events table — the batch query is
    // the ground truth for every (z, is_anomaly).
    val batch = SparkEntry.queries("g8_anomaly_zscore")(spark, sfDir)
      .as[(String, Long, Long, Long, Option[Double], Int)].collect()
      .sortBy(r => (r._1, r._2))
    assert(batch.exists(_._5.isDefined), "precondition: some scored windows")
    val input = MemoryStream[WC]
    val out = graft.streaming.Sessions.anomalyScores(input.toDS())
    val query = out.writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      // Deliver in watermark order, split across three micro-batches.
      val counts = batch.map(r => WC(r._1, r._2, r._3))
      val third = counts.length / 3
      for (chunk <- Seq(counts.take(third), counts.slice(third, 2 * third),
        counts.drop(2 * third))) {
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      val got = spark.table("anomaly_out").as[WS].collect()
        .map(w => (w.event_type, w.window_es) -> w).toMap
      assert(got.size == batch.length)
      for (r <- batch) {
        val w = got((r._1, r._2))
        assert(w.n == r._3 && w.n_prev == r._4, s"${r._1}/${r._2}: counts")
        (w.z, r._5) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"${r._1}/${r._2}: z $a vs $b")
          case (a, b) => assert(a == b, s"${r._1}/${r._2}: z presence")
        }
        assert(w.is_anomaly == r._6, s"${r._1}/${r._2}: flag")
      }
    } finally query.stop()
  }

  test("anomaly scores survive 100TB-scale window counts (no silent Long wrap)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{WindowCount => WC, WindowScore => WS}
    // r13 overflow sweep: the old fold squared Longs — counts above
    // ~3e9 per window (a 15-min window of a 100 TB stream) wrapped
    // SILENTLY and emitted garbage z. Drive the lambda with counts in
    // that regime and check against independent BigInt arithmetic.
    val base = 4_000_000_000L // squares to 1.6e19 > Long.MaxValue
    val counts = (0 until 9).map(i =>
      WC("hot", i * 900L, base + i * 1_000_000L)) :+
      WC("hot", 9 * 900L, base + 500_000_000L) // the probe window
    val input = MemoryStream[WC]
    val query = graft.streaming.Sessions.anomalyScores(input.toDS())
      .writeStream.format("memory").queryName("anomaly_big")
      .outputMode("append").start()
    try {
      input.addData(counts.toIndexedSeq)
      query.processAllAvailable()
      val got = spark.table("anomaly_big").as[WS].collect()
        .map(w => w.window_es -> w).toMap
      val probe = got(9 * 900L)
      assert(probe.n_prev == 9L)
      // Independent replay in exact BigInt arithmetic.
      val trail = counts.take(9).map(_.n)
      val n = 9
      val s1 = trail.map(BigInt(_)).sum
      val s2 = trail.map(c => BigInt(c) * BigInt(c)).sum
      val mean = s1.toDouble / n
      val variance = (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)
      assert(variance > 0, "precondition: spread counts")
      val want = BigDecimal((probeN(counts).toDouble - mean) / math.sqrt(variance))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(probe.z.isDefined, "z must be computed at this history depth")
      assert(math.abs(probe.z.get - want) < 1e-6,
        s"z ${probe.z.get} vs exact $want — a wrapped sum would be far off")
    } finally query.stop()
  }

  private def probeN(counts: Seq[graft.streaming.WindowCount]): Long =
    counts.last.n

  test("streaming dedup drops repeats within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")
    val out = Sessions.dedupStream(events, Seq("event_id"), "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(100)), (2L, ts(110)), (1L, ts(120)))
      query.processAllAvailable()
      input.addData((1L, ts(130)), (3L, ts(140)))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally query.stop()
  }

  test("deterministic dedup keeps the keyed-min row; later batches drop, not retract") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.streaming.FunnelEvent]
    val out = graft.streaming.Sessions.dedupKeyedMin(input.toDS())
    val query = out.writeStream.format("memory").queryName("dkm_out")
      .outputMode("append").start()
    import graft.streaming.{DedupKept => DK, FunnelEvent => FE}
    try {
      // Batch 1: u1/view has three rows — the min-(ts, event_id) one
      // wins WITHIN the batch (event_id 7 ties id 9 on ts and wins the
      // tie-break); u2/click emits its only row.
      input.addData(FE(1L, 9L, "view", ts(100)), FE(1L, 7L, "view", ts(100)),
        FE(1L, 8L, "view", ts(300)), FE(2L, 3L, "click", ts(50)))
      query.processAllAvailable()
      // Batch 2: a LATER batch brings an EARLIER-timed u1/view — the
      // prefix-correctness contract drops it (append mode cannot
      // retract the emitted keeper); a new key still emits.
      input.addData(FE(1L, 5L, "view", ts(10)), FE(2L, 6L, "view", ts(40)))
      query.processAllAvailable()
      val rows = spark.table("dkm_out").as[DK].collect().toSet
      assert(rows == Set(DK(1L, "view", 7L, 100L), DK(2L, "click", 3L, 50L),
        DK(2L, "view", 6L, 40L)), s"got $rows")
    } finally query.stop()
  }

  test("deterministic dedup emits identically on the RocksDB state store") {
    // The production posture at 100 TB event volumes: keyed state in
    // RocksDB (off-heap, spillable, changelog-checkpointable) instead
    // of the default in-memory HDFS-backed provider. The lambda's
    // emissions must be byte-identical — state round-trips through
    // the store's serde either way — and the progress metrics must
    // PROVE the provider actually engaged (a typo'd providerClass
    // would silently run the default and this spec would lie).
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[graft.streaming.FunnelEvent]
      val out = graft.streaming.Sessions.dedupKeyedMin(input.toDS())
      val query = out.writeStream.format("memory").queryName("dkm_rocks")
        .outputMode("append").start()
      import graft.streaming.{DedupKept => DK, FunnelEvent => FE}
      try {
        // The exact two-batch schedule of the HDFS-provider spec above.
        input.addData(FE(1L, 9L, "view", ts(100)), FE(1L, 7L, "view", ts(100)),
          FE(1L, 8L, "view", ts(300)), FE(2L, 3L, "click", ts(50)))
        query.processAllAvailable()
        input.addData(FE(1L, 5L, "view", ts(10)), FE(2L, 6L, "view", ts(40)))
        query.processAllAvailable()
        val rows = spark.table("dkm_rocks").as[DK].collect().toSet
        assert(rows == Set(DK(1L, "view", 7L, 100L), DK(2L, "click", 3L, 50L),
          DK(2L, "view", 6L, 40L)), s"got $rows")
        import scala.jdk.CollectionConverters._
        val metricKeys = Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().asScala)
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"RocksDB provider did not engage; state metrics: $metricKeys")
      } finally query.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("RocksDB + changelog checkpointing: dedup state survives a restart") {
    // The full production streaming posture in one spec: keyed state
    // in RocksDB, checkpoint uploads as per-batch CHANGELOGS (not
    // full snapshots), a mid-stream stop, and recovery from the
    // checkpoint. The keeper markers live ONLY in the state store —
    // source offsets for batch 1 are committed, so a lost store could
    // never rebuild them by reprocessing — which makes the
    // dropped-late-row assertion below a genuine recovery proof.
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val priorP = spark.conf.getOption(providerKey)
    val priorC = spark.conf.getOption(changelogKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelogKey, "true")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-rdkm").toString
      val input = MemoryStream[graft.streaming.FunnelEvent]
      val out = graft.streaming.Sessions.dedupKeyedMin(input.toDS())
      def start() = out.writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      var query = start()
      import graft.streaming.{DedupKept => DK, FunnelEvent => FE}
      try {
        input.addData(FE(1L, 9L, "view", ts(100)), FE(1L, 7L, "view", ts(100)),
          FE(2L, 3L, "click", ts(50)))
        query.processAllAvailable()
        query.stop() // keepers for (1,view)/(2,click) exist only as state
        query = start()
        // Post-restart: the earlier-timed (1,view) row must STILL be
        // dropped — only recovered state can know a keeper emitted.
        input.addData(FE(1L, 5L, "view", ts(10)), FE(2L, 6L, "view", ts(40)))
        query.processAllAvailable()
        val rows = spark.read.parquet(outDir).as[DK].collect().toSet
        assert(rows == Set(DK(1L, "view", 7L, 100L), DK(2L, "click", 3L, 50L),
          DK(2L, "view", 6L, 40L)), s"got $rows")
        // And the changelog mode really engaged: per-batch .changelog
        // files land under the checkpoint's state dir.
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        val changelogs = try walk.iterator().asScala
          .count(_.getFileName.toString.endsWith(".changelog"))
        finally walk.close()
        assert(changelogs > 0, "no .changelog files — snapshot mode ran instead")
      } finally query.stop()
    } finally {
      (priorP match { case Some(v) => spark.conf.set(providerKey, v)
                      case None => spark.conf.unset(providerKey) })
      (priorC match { case Some(v) => spark.conf.set(changelogKey, v)
                      case None => spark.conf.unset(changelogKey) })
    }
  }

  test("stream-stream click attribution joins within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("user_id", "event_id", "ts")
    val pdf = purchases.toDF().toDF("user_id", "event_id", "ts")
    val out = Sessions.clickAttribution(cdf, pdf, "30 minutes", "10 minutes")
    val query = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 100L, ts(1000)), (1L, 101L, ts(1500)), (2L, 102L, ts(1000)))
      purchases.addData((1L, 200L, ts(2000)))
      query.processAllAvailable()
      // Advance watermarks so results flush.
      clicks.addData((9L, 900L, ts(100000)))
      purchases.addData((9L, 901L, ts(100000)))
      query.processAllAvailable()
      val rows = spark.table("attr_out")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      // Purchase 200 attributes to BOTH of user 1's clicks within 30
      // minutes (100 at t=1000, 101 at t=1500); user 2's click never.
      assert(rows.contains((200L, 100L)) && rows.contains((200L, 101L)),
        s"got $rows")
      assert(!rows.exists(_._2 == 102L))
    } finally query.stop()
  }

  test("watermarked tumbling counts aggregate closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val out = Sessions.tumblingCounts(events, "15 minutes", "5 minutes")
    val query = out.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "click"), (ts(10), "click"), (ts(100), "view"))
      query.processAllAvailable()
      // Raise the max event time so the watermark passes 900s …
      input.addData((ts(5000), "click"))
      query.processAllAvailable()
      // … then run a batch under that watermark to flush window [0, 900).
      input.addData((ts(5001), "view"))
      query.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .as[(Long, String, Long)].collect().toSet
      assert(rows.contains((0L, "click", 2L)), s"got $rows")
      assert(rows.contains((0L, "view", 1L)), s"got $rows")
    } finally query.stop()
  }

  test("windowed distinct users emit exact small-cardinality HLL counts") {
    // Streaming face of g5: per-window approx_count_distinct. At the
    // cardinalities a spec can drive, the HLL sketch is exact — the
    // claim here is the windowing/watermark plumbing and that the
    // count is DISTINCT (repeat users collapse), not the sketch error
    // (that bound is pinned against batch in TextEventsSpec).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val events = input.toDF().toDF("ts", "event_type", "user_id")
    val out = Sessions.windowDistinctUsers(events, "1 hour", "5 minutes")
    val query = out.writeStream.format("memory").queryName("wdu_out")
      .outputMode("append").start()
    try {
      // Window [0, 3600): user 1 clicks twice, user 2 once.
      input.addData((ts(0), "click", 1L), (ts(10), "click", 1L),
        (ts(100), "click", 2L), (ts(200), "view", 2L))
      query.processAllAvailable()
      // Advance the watermark past 3600, then flush under it.
      input.addData((ts(9000), "click", 9L))
      query.processAllAvailable()
      input.addData((ts(9001), "view", 9L))
      query.processAllAvailable()
      val rows = spark.table("wdu_out")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows.contains((0L, "click", 2L, 3L)),
        s"click window must count 2 DISTINCT users over 3 events, got $rows")
      assert(rows.contains((0L, "view", 1L, 1L)), s"got $rows")
    } finally query.stop()
  }

  test("changeOps emits insert/update only on fingerprint change") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.streaming.DocVersion]
    val out = Sessions.changeOps(input.toDS())
    val query = out.writeStream.format("memory").queryName("ops_out")
      .outputMode("append").start()
    def ops(): Seq[(String, String)] =
      spark.table("ops_out").as[(String, String)].collect().toSeq
    try {
      import graft.streaming.DocVersion
      input.addData(DocVersion("a", "f1", 1L), DocVersion("b", "f1", 1L))
      query.processAllAvailable()
      assert(ops().sorted == Seq(("a", "insert"), ("b", "insert")))
      // a unchanged (silent), b changed (update), c new (insert).
      input.addData(DocVersion("a", "f1", 2L), DocVersion("b", "f2", 2L),
        DocVersion("c", "f9", 2L))
      query.processAllAvailable()
      assert(ops().sorted == Seq(("a", "insert"), ("b", "insert"),
        ("b", "update"), ("c", "insert")))
      // Re-publication of the same content stays silent.
      input.addData(DocVersion("b", "f2", 3L))
      query.processAllAvailable()
      assert(ops().count(_ == ("b", "update")) == 1)
      // Two same-batch versions: the highest seq wins, so state holds
      // f4 and a later f4 re-publication is silent.
      input.addData(DocVersion("d", "f3", 10L), DocVersion("d", "f4", 11L))
      query.processAllAvailable()
      assert(ops().count(_._1 == "d") == 1)
      input.addData(DocVersion("d", "f4", 12L))
      query.processAllAvailable()
      assert(ops().count(_._1 == "d") == 1, "re-publishing the batch winner must be silent")
    } finally query.stop()
  }

  test("stream-static validated counts update incrementally across batches") {
    implicit val sqlCtx = spark.sqlContext
    // Static closure: 4→2, 2→1 (so 4 reaches 2 and 1; 3 reaches nothing).
    val closure = graft.operators.Graph.transitiveClosure(
      Seq((4L, 2L), (2L, 1L)).toDF("src", "dst"))
    // Stream rows: (collection_id, member_type, required_type).
    val input = MemoryStream[(Long, Long, Long)]
    val out = Sessions.validatedCounts(
      input.toDF().toDF("collection_id", "member_type", "required_type"), closure)
    val query = out.writeStream.format("memory").queryName("vc_out")
      .outputMode("update").start()
    // Update mode appends one row per changed key per batch; totals
    // only grow, so the latest state is the max-total row (no reliance
    // on collect order).
    def counts(): Map[Long, (Long, Long)] =
      spark.table("vc_out").as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (k, rs) =>
          k -> rs.map(r => (r._2, r._3)).maxBy(t => t._1 + t._2) }
    try {
      input.addData((10L, 4L, 1L), (10L, 3L, 1L), (20L, 2L, 2L))
      query.processAllAvailable()
      val c1 = spark.table("vc_out").as[(Long, Long, Long)].collect().toSet
      assert(c1 == Set((10L, 1L, 1L), (20L, 1L, 0L)), s"got $c1")
      // Batch 2: one more valid member for 10 — running totals update.
      input.addData((10L, 2L, 1L))
      query.processAllAvailable()
      val c2 = counts()
      assert(c2(10L) == ((2L, 1L)), s"got $c2")
      assert(c2(20L) == ((1L, 0L)), s"got $c2")
    } finally query.stop()
  }

  test("continuous ES sync end to end: changeOps -> foreachBatch -> EsBulk files") {
    // The full continuous-sync loop the reference runs as a periodic
    // batch job: doc versions stream in, the stateful detector emits
    // insert/update ops, and each micro-batch lands as bulk NDJSON
    // files — the artifact an HTTP shipper posts. foreachBatch is the
    // documented integration point for batch sinks; per-batch subdirs
    // keep micro-batches append-only without touching EsBulk's
    // overwrite semantics.
    import org.apache.spark.sql.functions.{col, struct}
    import graft.streaming.{ChangeOp, DocVersion}
    implicit val sqlCtx = spark.sqlContext
    withTempDir("graft-essync-") { dir =>
      val input = MemoryStream[DocVersion]
      val writer: (org.apache.spark.sql.Dataset[ChangeOp], Long) => Unit =
        (batch, id) =>
          if (!batch.isEmpty)
            graft.sinks.EsBulk.write(batch.toDF(), "collections", "doc_id",
              "op", struct(col("doc_id").as("id")), s"$dir/batch_$id")
      val query = Sessions.changeOps(input.toDS())
        .writeStream.foreachBatch(writer).outputMode("append").start()
      try {
        input.addData(DocVersion("a", "f1", 1L))
        query.processAllAvailable()
        input.addData(DocVersion("a", "f2", 2L))
        query.processAllAvailable()
      } finally query.stop()
      // Each bulk entry is one action line + one document line (the
      // text sink materializes the embedded newline), so read back as
      // physical NDJSON lines — exactly what a bulk shipper consumes.
      val lines = spark.read.textFile(s"$dir/batch_*").collect().toSeq
      for (expected <- Seq(
          """{"index":{"_index":"collections","_id":"a"}}""",
          """{"id":"a"}""",
          """{"update":{"_index":"collections","_id":"a"}}""",
          """{"doc":{"id":"a"}}"""))
        assert(lines.contains(expected), s"missing $expected in $lines")
    }
  }

  test("null event times are skipped, not NPE'd, by every stateful lambda") {
    // The dedupKeyedMin convention extended file-wide (round-12
    // review): a null ts has no place in a time ordering, so the
    // funnel, the sessionizer, and the dedup all SKIP it — unguarded,
    // batch.toSeq.sortBy(_.ts.getTime) NPE'd the task while the
    // DuckDB oracles silently ranked nulls last (g12's even counted
    // the null row into the last session). Batch mode = the g10/g12/
    // g16 registration path, so this pins the gate-facing behavior.
    import graft.streaming.{DedupKept, FunnelEvent, FunnelStage}
    val fe = Seq(
      FunnelEvent(1L, 1L, "view", ts(100)), FunnelEvent(1L, 2L, "click", null),
      FunnelEvent(1L, 3L, "click", ts(200)), FunnelEvent(2L, 4L, "view", null))
      .toDS()
    val stages = Sessions.funnelStages(fe).collect().toSet
    assert(stages == Set(FunnelStage(1L, 1, 100L), FunnelStage(1L, 2, 200L)),
      s"null-ts events must not reach or break the funnel DP, got $stages")
    val se = Seq(SessionEvent(1L, 1L, ts(100)), SessionEvent(1L, 2L, null),
      SessionEvent(3L, 3L, null)).toDS()
    val sessions = Sessions.sessionize(se).collect().toSet
    assert(sessions == Set(SessionOut(1L, 100L, 100L, 1L)),
      s"null-ts events form no session (and an all-null user none), got $sessions")
    val kept = Sessions.dedupKeyedMin(fe).collect().toSet
    assert(kept == Set(DedupKept(1L, "view", 1L, 100L),
      DedupKept(1L, "click", 3L, 200L)),
      s"an all-null-ts key must emit nothing, got $kept")
  }
}
