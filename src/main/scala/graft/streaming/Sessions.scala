package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An input event for the stateful sessionizer (event time in epoch
  * seconds, carried as a timestamp column for watermarking). */
case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

/** A closed session emitted by the sessionizer. */
case class SessionOut(user_id: Long, start_es: Long, end_es: Long, n_events: Long)

/** Open-session state carried between micro-batches. */
case class SessionState(start_es: Long, end_es: Long, n_events: Long)

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

  /** Streaming exact dedup: drop repeats of `idCols` arriving within
    * the watermark horizon (state for an id is evicted once the
    * watermark passes its event time — bounded state, unlike a global
    * dropDuplicates). The streaming face of Dedup.exactGroups. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermarkDelay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

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

  /** Gap-based sessionizer (streaming g1): one open-session state per
    * user, closed and emitted when a new event arrives more than
    * `gapSec` after the session end, or when the event-time watermark
    * passes end + gap (timeout path). Emits Append-mode rows, so the
    * sink only ever sees finalized sessions.
    */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long = 1800L,
                 watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // Watermark passed end + gap: the open session is final.
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start_es, s.end_es, s.n_events))
          } else {
            // Events within a micro-batch arrive unordered; sort by
            // event time (+ id tiebreak) before folding into sessions.
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val es = e.ts.getTime / 1000L
              open match {
                case Some(s) if es - s.end_es <= gapSec =>
                  open = Some(SessionState(s.start_es, math.max(s.end_es, es),
                    s.n_events + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start_es, s.end_es, s.n_events)
                  open = Some(SessionState(es, es, 1L))
                case None =>
                  open = Some(SessionState(es, es, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // Time out once the watermark passes the session's gap
              // horizon — that's when no earlier event can still arrive.
              state.setTimeoutTimestamp((s.end_es + gapSec) * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
