package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group G — event analytics over the `events` table: gap-based
  * sessionization, tumbling-window aggregates, JSON property
  * extraction. These are the batch halves of the streaming operators in
  * `graft.streaming.Sessions` (same column logic, same results).
  *
  * Cross-engine determinism: all time arithmetic runs on epoch seconds
  * (`cast(ts as long)` floors identically in Spark and DuckDB), and
  * window ordering always carries `event_id` as a total tiebreak.
  *
  * Scale posture: g1 shuffles once on `user_id` (high cardinality — the
  * natural session partitioning at 100 TB); g2/g3 are single
  * map-side-combinable aggregations on (window, type) / type.
  */
object GroupG {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // g1: gap-based sessionization (30 min) — the classic
    // lag + cumulative-sum-of-boundaries window pattern; one shuffle.
    "g1_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val gap = col("es") - lag(col("es"), 1).over(w)
      Tables(s, d, "events")
        // A null event time belongs to no session (the g4/g5
        // convention) — and unfiltered it would diverge silently:
        // Spark orders NULLS FIRST, DuckDB NULLS LAST, so null-es
        // rows would seed different sessions on each engine.
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts").cast("long").as("es"))
        .withColumn("is_new", when(gap.isNull || gap > 1800L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             min(col("es")).as("start_es"),
             max(col("es")).as("end_es"))
    }),

    // g2: 15-minute tumbling-window counts per event type via the
    // native `window()` grouping (same shape Structured Streaming
    // uses); emitted as epoch seconds for the oracle compare.
    "g2_tumbling_counts" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
        .select(col("w.start").cast("long").as("window_es"), col("event_type"),
                col("n"), col("value_sum"))
    }),

    // g3: JSON property extraction + aggregation — schema-on-read over
    // the `props` JSON string column, no UDF.
    "g3_json_props" -> ((s, d) => {
      Tables(s, d, "events")
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("k_sum"),
             avg(col("k")).as("k_avg"))
    }),

    // g4: 15-minute windows HOPPING every 5 minutes — each event lands
    // in 3 overlapping windows. Two-level aggregation instead of the
    // native window(col, len, slide) fan-out: events first collapse
    // onto their 5-minute slide bucket (ONE narrow map-side-combinable
    // agg over the full table — no 3× row expansion before the big
    // shuffle), then the tiny (bucket × type) table fans each bucket
    // to the 3 windows containing it and re-sums. Identical result —
    // a 15m/5m window is exactly 3 whole slide buckets — but the
    // expensive aggregation runs once over N rows instead of 3N. At
    // 100 TB the fan-out input is window-count-sized, not event-sized.
    // (Structured Streaming keeps the native window() shape —
    // streaming/Sessions.scala — which is required for watermarking.)
    "g4_hopping_counts" -> ((s, d) => {
      val slide = 300L
      val pre = Tables(s, d, "events")
        // A null timestamp belongs to no window — the native window()
        // path drops it via its containment predicate and the oracle
        // via WHERE es >= window_es; match them, or null-ts rows
        // would surface as a spurious tripled NULL-window row.
        .filter(col("ts").isNotNull)
        .groupBy((floor(col("ts").cast("double") / slide).cast("long") * slide)
                   .as("bucket_es"),
                 col("event_type"))
        .agg(count(lit(1)).as("bn"))
      pre.select(col("event_type"), col("bn"),
          explode(array((0 to 2).map(o => col("bucket_es") - o * slide): _*))
            .as("window_es"))
        .groupBy("window_es", "event_type")
        .agg(sum(col("bn")).as("n"))
    }),

    // g5: distinct users per hourly window × event type — the standard
    // audience/reach aggregate. Written as the TWO-LEVEL exact form
    // (collapse to (window, type, user) first, then count groups):
    // both stages are map-side-combinable, so nothing ever holds a
    // per-group distinct set — the shape that survives 100 TB, unlike
    // a single-pass count_distinct (Expand-planned) or a per-group
    // hash set. The same groupBy with approx_count_distinct (HLL,
    // fixed-size mergeable sketch) is the declared form when exact
    // counts aren't required — drift pinned in TextEventsSpec.
    "g5_window_distinct" -> ((s, d) => {
      Tables(s, d, "events")
        .filter(col("ts").isNotNull)
        .groupBy((floor(col("ts").cast("double") / 3600).cast("long") * 3600)
                   .as("window_es"),
                 col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("en"))
        .groupBy("window_es", "event_type")
        .agg(count(lit(1)).as("n_users"), sum(col("en")).as("n_events"))
    }),

    // g6: ordered-funnel matching (view → click → purchase) — the
    // classic event-sequence operator the sessionizer family lacked.
    // Per user: t_view = first view; t_click = first click STRICTLY
    // after some earlier view; t_purchase = first purchase strictly
    // after such a click; stage = how deep the user got. Computed as
    // running-min window DP over (es, event_id) order — each stage's
    // cumulative min feeds the next stage's validity test via a
    // strictly-preceding ROWS frame (equal-timestamp events never
    // satisfy the chain, a stated contract both engines share).
    // Scale: the three window passes and the final per-user agg all
    // share ONE shuffle on user_id (the same partitioning g1 uses);
    // per-row state is three longs — no per-user event buffering.
    "g6_funnel" -> ((s, d) => funnelOf(Tables(s, d, "events"))),

    // g7: signup-cohort retention — users grouped by signup week,
    // counted per week-offset of later activity (the engagement
    // matrix every product pipeline derives from its event stream).
    "g7_retention" -> ((s, d) => retentionOf(Tables(s, d, "events"))),

    // g8: windowed anomaly detection — per event type, each 15-min
    // window's count z-scored against its trailing 12 OBSERVED
    // windows (empty windows aren't materialized — the trailing frame
    // is over windows that happened, the form a monitoring pipeline
    // wants when traffic is bursty). Requires ≥ 8 windows of history
    // and positive variance; |z| > 3 flags the anomaly.
    //
    // Scale: the window pass runs on the AGGREGATED (windows × types)
    // frame — a few rows per type per hour, never the event stream —
    // after one map-side-combinable count; low type cardinality is
    // therefore a frame-size non-issue.
    //
    // Cross-engine exactness: the trailing stats are EXACT integer
    // window sums (n, Σ, Σ²); mean/variance/z derive from them in one
    // fixed-order double expression, so there is no Welford-style
    // accumulation-order drift anywhere (stddev_samp would have it).
    "g8_anomaly_zscore" -> ((s, d) => anomalyOf(Tables(s, d, "events"))),

    // g9: g5's distinct-users question in its SKETCH form — a
    // deterministic HyperLogLog (md5 register hashes, so the DuckDB
    // oracle replays the ESTIMATE bit-for-bit, not a drift bound).
    // The register frame caps at (windows × types) × 256 rows after
    // the map-side partial max, vs g5's first shuffle keying on every
    // distinct (window, type, user) — the bounded-state form that
    // survives unbounded user cardinality. ±6.5% @ b=8; g5 remains
    // the exact answer at dim-like cardinalities.
    "g9_hll_distinct" -> ((s, d) => hllOf(Tables(s, d, "events"))),
  )

  /** g9 body, parameterized like [[funnelOf]] (the probe measures
    * THIS definition): hourly windows × type, user keys salted "u:"
    * so the register hash is independent of any other md5 use of
    * user_id. */
  private[graft] def hllOf(events: DataFrame): DataFrame =
    graft.operators.Sketches.hllDistinct(
      events.filter(col("ts").isNotNull)
        .select((floor(col("ts").cast("double") / 3600).cast("long") * 3600)
            .as("window_es"),
          col("event_type"),
          concat(lit("u:"), col("user_id").cast("string")).as("ukey")),
      Seq("window_es", "event_type"), col("ukey"), b = 8)

  /** g8 body, parameterized like [[funnelOf]] (the probe measures
    * THIS definition). Trailing stats are EXACT integer window sums
    * (n, Σ, Σ²) so mean/variance/z reduce to one fixed-order double
    * expression — no Welford accumulation-order drift. */
  /** The finalized 15-minute (window_es, event_type, n) counts both
    * g8's batch DP and g11's streaming-lambda replay consume — one
    * definition, so the two anomaly paths score identical windows. */
  private[graft] def windowCountsOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("window_es"),
        col("event_type"), col("n"))

  private[graft] def anomalyOf(events: DataFrame): DataFrame = {
    val counts = windowCountsOf(events)
    val wTrail = Window.partitionBy("event_type").orderBy("window_es")
      .rowsBetween(-12, -1)
    val mean = col("s1").cast("double") / col("n_prev")
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("n_prev")) /
      (col("n_prev") - 1)
    counts
      .withColumn("n_prev", count(col("n")).over(wTrail))
      .withColumn("s1", sum(col("n")).over(wTrail))
      // Σn² in DECIMAL, not long (r13 overflow sweep): a 15-min
      // window holding > 3e9 events — a 100 TB stream, not a fantasy
      // — squares past Long.MaxValue and ANSI throws the whole query.
      // decimal(18,0)² → decimal(37,0), the 12-window sum fits
      // decimal(38,0) exactly (the a38 moments precedent); the final
      // .cast("double") reads the same value either way at any scale
      // the exactness contract covers.
      .withColumn("s2", sum(col("n").cast("decimal(18,0)") *
        col("n").cast("decimal(18,0)")).over(wTrail))
      .withColumn("z", when(col("n_prev") >= 8 && variance > 0,
        round((col("n").cast("double") - mean) / sqrt(variance), 6)))
      .withColumn("is_anomaly",
        when(col("z").isNotNull && abs(col("z")) > 3, 1).otherwise(0))
      .select("event_type", "window_es", "n", "n_prev", "z", "is_anomaly")
  }

  /** g6 body, parameterized on the raw events frame — the probe
    * (graft.tools.ScaleProbe) measures THIS definition, so the two
    * can never drift. Ordered-funnel matching as a running-min window
    * DP: each stage's cumulative min feeds the next stage's
    * strictly-after test via a strictly-preceding ROWS frame
    * (equal-timestamp events never satisfy the chain — a stated
    * contract both engines share). Scale: the three window passes and
    * the final per-user agg all share ONE shuffle on user_id (the
    * same partitioning g1 uses); per-row state is three longs — no
    * per-user event buffering. */
  private[graft] def funnelOf(events: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("es"))
      .withColumn("v_min",
        min(when(col("event_type") === "view", col("es"))).over(wPrev))
      .withColumn("c_ok",
        when(col("event_type") === "click" && col("v_min") < col("es"), col("es")))
      .withColumn("c_min", min(col("c_ok")).over(wPrev))
      .withColumn("p_ok",
        when(col("event_type") === "purchase" && col("c_min") < col("es"), col("es")))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("es"))).as("t_view"),
           min(col("c_ok")).as("t_click"),
           min(col("p_ok")).as("t_purchase"))
      .withColumn("stage",
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1).otherwise(0))
  }

  /** g7 body, parameterized like [[funnelOf]]. Scale: the cohort
    * frame is one map-side-combinable min-agg per user; activity
    * collapses to distinct (user, week) BEFORE the join, so nothing
    * downstream sees more than one row per user per week — which is
    * also why the final agg is a plain count: each (cohort_week,
    * week_offset) group already holds one row per distinct user, so
    * a countDistinct would pay an Expand-planned extra shuffle to
    * deduplicate the already-deduplicated (the g5 doctrine). */
  private[graft] def retentionOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("es"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(expr("min(es) DIV 604800").as("cohort_week"))
    val active = ev.select(col("user_id"), expr("es DIV 604800").as("week"))
      .distinct()
    active.join(cohort, "user_id")
      .filter(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val oracles: Map[String, String] = Map(
    "g1_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, cast(floor(epoch(ts)) AS bigint) AS es
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (
        |  SELECT *, CASE WHEN lag(es) OVER w IS NULL
        |                   OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM m)
        |SELECT user_id, cast(session_id AS bigint) AS session_id,
        |  count(*) AS n_events, min(es) AS start_es, max(es) AS end_es
        |FROM s GROUP BY 1, 2""".stripMargin,

    // ts IS NOT NULL on the oracle because Spark's window() drops
    // null event times itself (the TimeWindowing rule filters the
    // time column non-null) — without it DuckDB would keep a NULL
    // window group Spark never emits.
    "g2_tumbling_counts" ->
      """SELECT cast(floor(epoch(ts) / 900) * 900 AS bigint) AS window_es,
        |  event_type, count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,2))) AS double) AS value_sum
        |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "g3_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint) AS k_sum,
        |  avg(cast(json_extract_string(props, '$.k') AS bigint)) AS k_avg
        |FROM events GROUP BY 1""".stripMargin,

    "g5_window_distinct" ->
      """WITH e AS (
        |  SELECT cast(floor(epoch(ts) / 3600) * 3600 AS bigint) AS window_es,
        |    event_type, user_id
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (
        |  SELECT window_es, event_type, user_id, count(*) AS en
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT window_es, event_type, count(*) AS n_users,
        |  cast(sum(en) AS bigint) AS n_events
        |FROM g GROUP BY 1, 2""".stripMargin,

    "g4_hopping_counts" ->
      """WITH e AS (
        |  SELECT event_type, cast(floor(epoch(ts)) AS bigint) AS es FROM events),
        |fan AS (
        |  SELECT event_type,
        |    (es // 300 - o) * 300 AS window_es, es
        |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS o))
        |SELECT window_es, event_type, count(*) AS n
        |FROM fan
        |WHERE es >= window_es AND es < window_es + 900
        |GROUP BY 1, 2""".stripMargin,

    // Same running-min DP, same strictly-preceding ROWS frame, same
    // (es, event_id) total order — the chain's strict-< contract
    // makes equal-timestamp behavior identical on both engines.
    "g6_funnel" ->
      """WITH b AS (SELECT user_id, event_id, event_type,
        |             cast(floor(epoch(ts)) AS bigint) AS es FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END) OVER
        |         (PARTITION BY user_id ORDER BY es, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_min
        |       FROM b),
        |w2 AS (SELECT *, CASE WHEN event_type = 'click' AND v_min < es
        |                 THEN es END AS c_ok FROM w1),
        |w3 AS (SELECT *, min(c_ok) OVER
        |         (PARTITION BY user_id ORDER BY es, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_min
        |       FROM w2),
        |w4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND c_min < es
        |                 THEN es END AS p_ok FROM w3)
        |SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN es END) AS t_view,
        |  min(c_ok) AS t_click,
        |  min(p_ok) AS t_purchase,
        |  cast(CASE WHEN min(p_ok) IS NOT NULL THEN 3
        |       WHEN min(c_ok) IS NOT NULL THEN 2
        |       WHEN min(CASE WHEN event_type = 'view' THEN es END) IS NOT NULL THEN 1
        |       ELSE 0 END AS int) AS stage
        |FROM w4 GROUP BY 1""".stripMargin,

    "g7_retention" ->
      """WITH e AS (SELECT user_id, event_type,
        |             cast(floor(epoch(ts)) AS bigint) AS es FROM events),
        |c AS (SELECT user_id, min(es) // 604800 AS cohort_week
        |      FROM e WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, es // 604800 AS week FROM e)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  cast(count(*) AS bigint) AS n_users
        |FROM a JOIN c USING (user_id)
        |WHERE week >= cohort_week
        |GROUP BY 1, 2""".stripMargin,

    // g8: the trailing window sums are cast to BIGINT the instant
    // they leave the frame (DuckDB sum(BIGINT) is HUGEINT — the f12
    // lesson); the mean/variance/z expression is character-for-
    // character the same fixed-order double math as the Spark side.
    "g8_anomaly_zscore" ->
      """WITH c AS (SELECT cast(floor(epoch(ts) / 900) * 900 AS bigint) AS window_es,
        |             event_type, cast(count(*) AS bigint) AS n
        |           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT event_type, window_es, n,
        |        cast(count(n) OVER w AS bigint) AS n_prev,
        |        cast(sum(n) OVER w AS bigint) AS s1,
        |        sum(cast(n AS hugeint) * n) OVER w AS s2
        |      FROM c
        |      WINDOW w AS (PARTITION BY event_type ORDER BY window_es
        |                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, window_es, n, n_prev,
        |        CASE WHEN n_prev >= 8 AND
        |               (cast(s2 AS double) - cast(s1 AS double) * cast(s1 AS double)
        |                  / n_prev) / (n_prev - 1) > 0
        |             THEN round((cast(n AS double) - cast(s1 AS double) / n_prev)
        |               / sqrt((cast(s2 AS double) - cast(s1 AS double)
        |                         * cast(s1 AS double) / n_prev) / (n_prev - 1)), 6)
        |        END AS z
        |      FROM t)
        |SELECT event_type, window_es, n, n_prev, z,
        |  cast(CASE WHEN z IS NOT NULL AND abs(z) > 3 THEN 1 ELSE 0 END AS int)
        |    AS is_anomaly
        |FROM z""".stripMargin,

    // g9 replays the WHOLE HyperLogLog: the md5 register hash
    // (hash64md5 of the salted user key, mapped to unsigned via
    // HUGEINT so bucket/rank math is on the same non-negative value
    // Spark's bitwiseAND/shiftrightunsigned see), max-rank registers,
    // the exact-integer harmonic sum (2^(57-rho) terms; HUGEINT =
    // Spark's DECIMAL(38,0) here), one final double division with an
    // identical alpha·m²·2^57 literal, and the linear-counting branch.
    // bin() is minimal-width in both engines, so the rank expression
    // is shared character-for-character.
    "g9_hll_distinct" ->
      s"""WITH e AS (SELECT cast(floor(epoch(ts) / 3600) * 3600 AS bigint)
         |             AS window_es,
         |           event_type, 'u:' || user_id AS ukey
         |           FROM events WHERE ts IS NOT NULL),
         |hh AS (SELECT window_es, event_type,
         |         ${DuckSql.hash64md5("ukey")} AS h FROM e),
         |uu AS (SELECT window_es, event_type,
         |         h::HUGEINT + CASE WHEN h < 0
         |           THEN 18446744073709551616::HUGEINT
         |           ELSE 0::HUGEINT END AS v
         |       FROM hh),
         |reg AS (SELECT window_es, event_type,
         |          cast(v % 256 AS bigint) AS bucket,
         |          max(CASE WHEN cast(v // 256 AS bigint) = 0 THEN 57
         |               ELSE 57 - length(bin(cast(v // 256 AS bigint))) END)
         |            AS mr
         |        FROM uu GROUP BY 1, 2, 3),
         |agg AS (SELECT window_es, event_type, count(*) AS present,
         |          sum((1::BIGINT << (57 - mr))::HUGEINT) AS s
         |        FROM reg GROUP BY 1, 2),
         |est AS (SELECT window_es, event_type,
         |          256 - present AS zeros,
         |          $hllAlphaNum / cast(s + (256 - present)::HUGEINT
         |            * 144115188075855872::HUGEINT AS DOUBLE) AS raw
         |        FROM agg)
         |SELECT window_es, event_type,
         |  round(CASE WHEN raw <= 640.0 AND zeros > 0
         |             THEN 256.0 * ln(256.0 / cast(zeros AS DOUBLE)) ELSE raw END,
         |        4) AS n_approx
         |FROM est""".stripMargin,
  )

  /** The alpha·m²·2^57 numerator of g9's one-division estimator —
    * the SAME operation order as [[graft.operators.Sketches]], so the
    * interpolated literal is the identical double. A `def`, NOT a
    * `val`: the oracle map above interpolates it, and a val declared
    * below the map would still be 0.0 at map-construction time
    * (object vals initialize in declaration order) — which poisoned
    * the raw-branch divisor while every small-cardinality gate group
    * took the linear-counting branch and hid it. */
  private def hllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / 256) * 256.0 * 256.0 * math.pow(2.0, 57)
}
