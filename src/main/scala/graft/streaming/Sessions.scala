package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An input event for the stateful sessionizer (event time in epoch
  * seconds, carried as a timestamp column for watermarking). */
case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

/** A closed session emitted by the sessionizer. */
case class SessionOut(user_id: Long, start_es: Long, end_es: Long, n_events: Long)

/** One open session; the sessionizer state is the list of a user's
  * open sessions (plural: late events above the watermark may reopen
  * or create sessions earlier than the newest one). */
case class SessionState(start_es: Long, end_es: Long, n_events: Long)

/** Sessionizer state: open sessions, kept start-ascending. */
case class SessionizerState(open: List[SessionState])

/** A document version on the sync stream: id + content fingerprint +
  * a monotone sequence (publish time / offset) that makes "latest
  * version in a batch" well-defined — shuffle iterator order is not. */
case class DocVersion(doc_id: String, fingerprint: String, seq: Long)

/** An input event for the streaming funnel (same fields the batch g6
  * query reads from the events table). */
case class FunnelEvent(user_id: Long, event_id: Long, event_type: String,
                       ts: java.sql.Timestamp)

/** A stage-reach emission from [[Sessions.funnelStages]]: the user
  * advanced to `stage` (1 = view, 2 = click, 3 = purchase) at event
  * time `es`. */
case class FunnelStage(user_id: Long, stage: Int, es: Long)

/** Funnel progress per user: the minimal stage times seen so far
  * (-1 = stage not reached) — three longs, the WHOLE per-user state. */
case class FunnelProgress(t_view: Long, t_click: Long, t_purchase: Long)

/** A change operation emitted by [[Sessions.changeOps]]. */
case class ChangeOp(doc_id: String, op: String)

/** The kept row emitted by [[Sessions.dedupKeyedMin]] — the keyed-min
  * keeper with its event time floored to epoch seconds (the repo's
  * canonical es convention). */
case class DedupKept(user_id: Long, event_type: String, event_id: Long,
                     es: Long)

/** [[Sessions.dedupKeyedMin]] state: the keeper has been emitted for
  * this key (its id kept for debuggability; presence is the signal). */
case class DedupSeen(event_id: Long)

/** A finalized window count entering [[Sessions.anomalyScores]] —
  * the shape [[Sessions.tumblingCounts]] emits once the watermark
  * closes a window. */
case class WindowCount(event_type: String, window_es: Long, n: Long)

/** A scored window from [[Sessions.anomalyScores]]: the batch g8
  * columns (z absent below the history floor or at zero variance). */
case class WindowScore(event_type: String, window_es: Long, n: Long,
                       n_prev: Long, z: Option[Double], is_anomaly: Int)

/** Anomaly-scorer state per event type: the trailing window counts,
  * newest last, capped at the history length — ≤ 12 longs, the WHOLE
  * per-type state (bounded by types × history, never stream length). */
case class TrailCounts(counts: List[Long])

/** Structured Streaming counterparts of the Group G batch queries —
  * same column logic, incremental execution. (Reference analogue: the
  * reference recomputes collections from full dumps on an Airflow
  * schedule — airflow/dags/pipeline.py; these operators are the
  * continuous version of the same aggregations.)
  *
  * Scale posture: state is keyed by `user_id` (high cardinality, so
  * state shards evenly across executors); watermarks bound state size —
  * nothing here grows with stream length.
  */
object Sessions {

  /** Tumbling-window counts per event type (streaming g2): watermark +
    * event-time window, so late data beyond `watermarkDelay` is dropped
    * and window state is evicted once the watermark passes. */
  def tumblingCounts(events: DataFrame, windowLength: String = "15 minutes",
                     watermarkDelay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("window_es"), col("event_type"), col("n"))

  /** Approximate distinct users per tumbling window × event type
    * (streaming g5): watermark + event-time window with
    * approx_count_distinct — the HLL sketch is a fixed-size mergeable
    * aggregation buffer, so per-window state stays bounded no matter
    * how many distinct users a window sees (an exact streaming
    * distinct would hold every id in state until eviction). The batch
    * query keeps the two-level exact form; this is the form that runs
    * unbounded. */
  def windowDistinctUsers(events: DataFrame,
                          windowLength: String = "1 hour",
                          watermarkDelay: String = "30 minutes",
                          rsd: Double = 0.02): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"),
           count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long").as("window_es"), col("event_type"),
        col("n_users"), col("n_events"))

  /** Streaming exact dedup: drop repeats of `idCols` arriving within
    * the watermark horizon (state for an id is evicted once the
    * watermark passes its event time — bounded state, unlike a global
    * dropDuplicates). The streaming face of Dedup.exactGroups. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermarkDelay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** DETERMINISTIC streaming dedup — the oracle-able sibling of
    * [[dedupStream]]: where `dropDuplicatesWithinWatermark` keeps
    * whichever row the shuffle happens to deliver first (correct as a
    * set of keys, arbitrary as rows — the reason it stayed spec-only),
    * this keeps the MIN row per (user_id, event_type) key in full-
    * precision (event time, event_id) order, via the same
    * `flatMapGroupsWithState` machinery as the funnel/sessionizer.
    * State per key is one emitted-keeper marker ([[DedupSeen]], 8
    * bytes) — bounded by key cardinality, never stream length.
    *
    * Batch-mode contract (the g10/g12 pattern): one invocation sees a
    * key's whole history, so the emission IS the keyed minimum —
    * equal to the a9 `firstByKey` shape, which is what lets the
    * correctness gate oracle this code path (g16). Streaming is
    * PREFIX-CORRECT like [[funnelStages]]: the keeper is minimal over
    * the rows seen up to its first batch; a later batch's
    * earlier-timed row is dropped, not retracted (append mode cannot
    * unsay an emission) — feed late-tolerant analyses through the
    * batch a9 instead. Ordering compares event time at MICROsecond
    * precision (the g13 epoch_us convention) with event_id as the
    * deterministic tie-break; the emitted `es` is floored seconds,
    * the repo's canonical output convention. */
  def dedupKeyedMin(events: Dataset[FunnelEvent]): Dataset[DedupKept] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DedupSeen, DedupKept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), batch: Iterator[FunnelEvent],
         state: GroupState[DedupSeen]) =>
          if (state.exists) Iterator.empty // keeper already emitted
          else {
            // Single O(1)-memory pass: track the (micros, event_id)
            // minimum. floorDiv handles pre-epoch times; getNanos
            // carries the full sub-second part (getTime only millis).
            var bestUs = Long.MaxValue
            var bestId = Long.MaxValue
            var found = false
            // events.ts is nullable corpus-wide (the a39/g1/g8 oracles
            // all filter it); a null has no place in a time ordering,
            // so it is skipped here — a key with ONLY null-ts rows
            // emits nothing, matching the oracle's NOT NULL filter —
            // rather than NPE-ing the task (round-11 advice).
            batch.filter(_.ts != null).foreach { e =>
              val sec = Math.floorDiv(e.ts.getTime, 1000L)
              val us = sec * 1000000L + e.ts.getNanos / 1000L
              if (!found || us < bestUs ||
                  (us == bestUs && e.event_id < bestId)) {
                bestUs = us; bestId = e.event_id; found = true
              }
            }
            if (!found) Iterator.empty
            else {
              state.update(DedupSeen(bestId))
              Iterator.single(DedupKept(key._1, key._2, bestId,
                Math.floorDiv(bestUs, 1000000L)))
            }
          }
      }
  }

  /** Stream-stream interval join: each purchase pairs with the same
    * user's clicks in the `joinWindow` before it. Both sides carry
    * watermarks so the join state is evicted once no counterpart can
    * arrive — the continuously-running analogue of the batch as-of
    * enrichment (Relational.asofJoin). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       joinWindow: String = "30 minutes",
                       watermarkDelay: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .selectExpr("user_id AS c_user", "event_id AS click_id", "ts AS click_ts")
    val p = purchases.withWatermark("ts", watermarkDelay)
      .selectExpr("user_id AS p_user", "event_id AS purchase_id", "ts AS purchase_ts")
    p.join(c, expr(
      s"""p_user = c_user AND
         |click_ts <= purchase_ts AND
         |click_ts >= purchase_ts - interval $joinWindow""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("click_ts"), col("purchase_ts"))
  }

  /** Incremental type-validation counts — the streaming face of the
    * pipeline's filter_articles2 stage (batch: b2/Collections.build).
    * A stream of typed membership rows joins the STATIC subclass
    * closure — a stream-static join costs no streaming state; the
    * batch side broadcasts or shuffles like any dim — through the
    * same [[graft.operators.Graph.validateReachable]] the batch path
    * uses, then maintains per-collection valid/invalid counts (update
    * mode; running totals, the aggregation state is one row per
    * collection). New members arriving on the stream update their
    * collection's counts without recomputing anything batch-side.
    *
    * DURABILITY: the static side is re-read every micro-batch for the
    * lifetime of the query. Graph closure outputs are unions of
    * lineage cuts that DEFAULT to `localCheckpoint` blocks —
    * executor-local, NOT recomputable — so a lost executor would fail
    * the next micro-batch with an unrecoverable missing-block error.
    * For a production stream set `spark.graft.checkpointDir`
    * ([[graft.operators.Checkpoints]]): every cut becomes a reliable
    * checkpoint on the fault-tolerant FS that micro-batches can
    * re-read after executor loss — or materialize the closure to
    * storage explicitly and re-read it.
    */
  def validatedCounts(members: DataFrame, closure: DataFrame,
                      typeCol: String = "member_type",
                      targetCol: String = "required_type"): DataFrame =
    graft.operators.Graph.validateReachable(members, closure, typeCol, targetCol)
      .groupBy(col("collection_id"))
      .agg(sum(when(col("valid"), 1L).otherwise(0L)).as("valid_cnt"),
           sum(when(col("valid"), 0L).otherwise(1L)).as("invalid_cnt"))

  /** The streaming face of the ES sync: a stream of (doc, content
    * fingerprint) versions becomes insert / update change ops by
    * comparing each arrival to the per-id state of the last emitted
    * fingerprint — the continuous analogue of
    * [[graft.operators.Relational.diffSnapshots]] + [[graft.sinks
    * .EsBulk]] (the reference recomputes the full snapshot diff per
    * Airflow run; this emits the same ops as changes arrive).
    * Unchanged re-publications emit nothing. Archive ops are NOT
    * expressible on a pure arrival stream (absence is not an event) —
    * the periodic batch diff stays the authority for deletions.
    *
    * Sink integration: `writeStream.foreachBatch` rendering each
    * micro-batch through [[graft.sinks.EsBulk.write]] into a
    * per-batch directory — the full continuous sync loop, spec'd end
    * to end in StreamingSpec down to the NDJSON action/document
    * lines.
    *
    * State: one fingerprint per doc id, forever (no watermark — a doc
    * may legitimately update years later). At a 10⁹-doc id space that
    * is executor-sharded KV state, the same durability class as the
    * sessionizer's; bound it operationally (state-store TTL, or
    * periodic full batch re-sync) rather than with a correctness-
    * breaking timeout here.
    */
  def changeOps(docs: Dataset[DocVersion]): Dataset[ChangeOp] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.doc_id)
      .flatMapGroupsWithState[String, ChangeOp](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, versions: Iterator[DocVersion], state: GroupState[String]) =>
          // Single O(1)-memory pass; the highest-seq version wins the
          // batch (iterator order is shuffle order, not event order),
          // fingerprint as a deterministic tie-break on equal seq. A
          // null fingerprint normalizes to the empty string (the
          // repo-wide null-text-as-empty contract, Dedup.exactGroups)
          // so the tie-break and the state round-trip are total.
          def fp(v: DocVersion): String =
            if (v.fingerprint == null) "" else v.fingerprint
          var best: DocVersion = null
          versions.foreach { v =>
            if (best == null || v.seq > best.seq ||
                (v.seq == best.seq && fp(v) > fp(best))) best = v
          }
          if (best == null) Iterator.empty
          else {
            val prior = state.getOption
            if (prior.contains(fp(best))) Iterator.empty // no state I/O
            else {
              state.update(fp(best))
              if (prior.isEmpty) Iterator.single(ChangeOp(id, "insert"))
              else Iterator.single(ChangeOp(id, "update"))
            }
          }
      }
  }

  /** Streaming funnel (streaming g6): per-user ordered
    * view → click → purchase matching with the SAME strictly-after
    * chain rule as the batch window DP, emitting one row each time a
    * user reaches a new stage. State per user is exactly the three
    * minimal stage times — [[FunnelProgress]], 24 bytes — so state
    * size is bounded by the user population, never by stream length
    * (the same bounded-state argument as the batch operator's
    * three-longs-per-row claim, made literal).
    *
    * Contract: each batch's events are processed in (ts, event_id)
    * order, so under in-order delivery the reached stages and their
    * times equal the batch g6 result exactly (spec-pinned). A
    * cross-batch late view CAN refine the view threshold for future
    * clicks but cannot retroactively validate a click already seen —
    * the same prefix-correctness class as [[dedupStream]]; feed
    * late-tolerant analyses through the batch query instead.
    */
  /** Streaming face of the batch g8 anomaly query: consumes the
    * FINALIZED window counts ([[tumblingCounts]]' append-mode output —
    * windows arrive in watermark order, one per type) and z-scores
    * each against its type's trailing `history` windows, exactly the
    * batch DP: mean/variance from exact integer sums in the same
    * fixed-order double expression, the same ≥ `minHistory` floor,
    * positive-variance gate and 6-dp round, so stage-for-stage parity
    * with `GroupG.anomalyOf` under in-order delivery (spec'd). State
    * per type is ≤ `history` longs — bounded by types × history,
    * never stream length. */
  def anomalyScores(counts: Dataset[WindowCount], history: Int = 12,
                    minHistory: Int = 8): Dataset[WindowScore] = {
    import counts.sparkSession.implicits._
    counts.groupByKey(_.event_type)
      .flatMapGroupsWithState[TrailCounts, WindowScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, batch: Iterator[WindowCount],
         state: GroupState[TrailCounts]) =>
          var trail = state.getOption.map(_.counts).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[WindowScore]()
          for (w <- batch.toSeq.sortBy(_.window_es)) {
            val nPrev = trail.length
            val z: Option[Double] =
              if (nPrev < minHistory) None
              else {
                // Σn² through BigInt (r13 overflow sweep): the Long
                // fold wraps SILENTLY past c > 3e9 — worse than the
                // batch side's loud ANSI throw — and a 15-min window
                // on a 100 TB stream reaches that. Exact at any
                // scale, ≤ 12 terms per window: cost is noise.
                val s1 = trail.sum.toDouble
                val s2 = trail.map(c => BigInt(c) * BigInt(c)).sum.toDouble
                val mean = s1 / nPrev
                val variance = (s2 - s1 * s1 / nPrev) / (nPrev - 1)
                if (variance > 0)
                  Some(BigDecimal((w.n.toDouble - mean) / math.sqrt(variance))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                else None
              }
            out += WindowScore(tpe, w.window_es, w.n, nPrev.toLong, z,
              if (z.exists(v => math.abs(v) > 3)) 1 else 0)
            trail = (trail :+ w.n).takeRight(history)
          }
          state.update(TrailCounts(trail))
          out.iterator
      }
  }

  def funnelStages(events: Dataset[FunnelEvent]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelStage](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent],
         state: GroupState[FunnelProgress]) =>
          val prior = state.getOption.getOrElse(FunnelProgress(-1L, -1L, -1L))
          var (v, c, p) = (prior.t_view, prior.t_click, prior.t_purchase)
          val out = scala.collection.mutable.ListBuffer[FunnelStage]()
          // A null event time has no place in the chain ordering — the
          // dedupKeyedMin convention: skip it (vs NPE-ing the task);
          // the g10 oracle filters the same rows.
          for (e <- batch.filter(_.ts != null)
                 .toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
            // floorDiv, not /: a plain long division truncates toward
            // zero, putting a pre-epoch sub-second event one second
            // late vs the floor(epoch(ts)) convention every batch
            // query and oracle in this repo uses.
            val es = Math.floorDiv(e.ts.getTime, 1000L)
            e.event_type match {
              case "view" if v < 0 || es < v =>
                if (v < 0) out += FunnelStage(userId, 1, es)
                v = es
              case "click" if v >= 0 && v < es && (c < 0 || es < c) =>
                if (c < 0) out += FunnelStage(userId, 2, es)
                c = es
              case "purchase" if c >= 0 && c < es && (p < 0 || es < p) =>
                if (p < 0) out += FunnelStage(userId, 3, es)
                p = es
              case _ =>
            }
          }
          if (v != prior.t_view || c != prior.t_click || p != prior.t_purchase)
            state.update(FunnelProgress(v, c, p))
          out.iterator
      }
  }

  /** Gap-based sessionizer (streaming g1): state holds the user's OPEN
    * sessions (a list — late events above the watermark may land
    * before the newest session and must not corrupt it); every batch
    * merges events and existing sessions as intervals with the gap
    * rule, then emits exactly the sessions whose gap horizon
    * (end + gap) the watermark has passed — those can never change
    * again. Append-mode: the sink only ever sees finalized sessions.
    */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long = 1800L,
                 watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // Batch-mode contract: on a non-streaming input the watermark is
    // +∞ (one invocation sees a user's whole history), so every
    // session finalizes and the output equals the batch g1 gap
    // sessionization — the SAME lambda the streaming sink sees, which
    // is what lets the correctness gate oracle this code path
    // (g12_stream_sessionize). Watermark/timeout state-store calls
    // are gated on `streaming`: they throw without a real watermark.
    val streaming = events.isStreaming
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionizerState, SessionOut](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionizerState]) =>
          val prior = state.getOption.map(_.open).getOrElse(Nil)
          // Null event times are skipped (the dedupKeyedMin
          // convention): a session is a time interval, and the g12
          // oracle filters the same rows — unguarded they would NPE
          // here while DuckDB silently counted them into the last
          // session (divergence in both directions).
          val fresh = batch.filter(_.ts != null).map { e =>
            // floorDiv, not /: a plain long division truncates toward
            // zero, putting a pre-epoch sub-second event one second
            // late vs the floor(epoch(ts)) convention every batch
            // query and oracle in this repo uses.
            val es = Math.floorDiv(e.ts.getTime, 1000L)
            SessionState(es, es, 1L)
          }.toList
          // Interval merge under the gap rule (sort by start; a session
          // starting within gap of the previous end merges into it).
          val merged = (prior ++ fresh).sortBy(s => (s.start_es, s.end_es))
            .foldLeft(List.empty[SessionState]) {
              case (acc @ (last :: rest), s) if s.start_es - last.end_es <= gapSec =>
                SessionState(last.start_es, math.max(last.end_es, s.end_es),
                  last.n_events + s.n_events) :: rest
              case (acc, s) => s :: acc
            }.reverse
          // Finalize every session the watermark has sealed (batch:
          // everything — no more data can arrive).
          val wmSec =
            if (streaming) state.getCurrentWatermarkMs() / 1000L
            else Long.MaxValue / 1000L
          val (done, live) = merged.partition(_.end_es + gapSec <= wmSec)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionizerState(live))
            // Wake when the earliest live horizon passes (strictly
            // above the current watermark by construction).
            if (streaming)
              state.setTimeoutTimestamp((live.map(_.end_es).min + gapSec) * 1000L)
          }
          done.iterator.map(s =>
            SessionOut(userId, s.start_es, s.end_es, s.n_events))
      }
  }
}
