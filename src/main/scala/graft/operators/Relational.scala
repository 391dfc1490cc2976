package graft.operators

import graft.operators.Checkpoints.Cuttable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational building blocks used across the collection
  * pipeline. All of them are declarative DataFrame transformations so
  * Catalyst keeps the whole plan optimizable (pushdown through them,
  * partial aggregation, AQE skew handling on their shuffles).
  */
object Relational {

  /** Top-k rows per group, deterministic given a total tiebreak order.
    *
    * Spark-first replacement for the reference's "sort members, take
    * top 10" (collection-templates scripts/prepare_collections2.py:181)
    * — a rank window over data already shuffled by the group key, so
    * it costs exactly one shuffle and streams per-group.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Keep exactly one row per key — the first under `orderCols`.
    * (reference: uniq_members in scripts/prepare_members_names.py:55,
    * which keeps the highest-ranked duplicate of a curated name.)
    */
  def firstByKey(df: DataFrame, keyCols: Seq[Column],
                 orderCols: Seq[Column]): DataFrame =
    topKPerGroup(df, keyCols, orderCols, 1, "__rn").drop("__rn")

  /** As-of join: attach to every left row the latest right row of the
    * same `key` with `rightTs` ≤ `leftTs` (inclusive), as a nullable
    * `asof` struct of the right side's columns.
    *
    * Spark-first formulation: tag and union both sides, shuffle ONCE on
    * `key`, and stream a `last(_, ignoreNulls)` running window ordered
    * by (ts, side) — right rows sort before left rows at equal
    * timestamps, which is what makes the match inclusive. No range
    * join, no per-row probe; cost is one shuffle + one sort regardless
    * of how many right rows precede each left row. When (key, ts) is
    * not unique on the right, ties resolve to the LARGEST values of
    * `rightTiebreak` (right-side column names) — pass it to make the
    * result deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightTiebreak: Seq[String] = Nil): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    val lSide = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"), lit(1).as("__side"))
    // A right row with a null key or null timestamp can never satisfy
    // the match contract (key equality ∧ rightTs <= leftTs are both
    // null-false) — but unfiltered it would sort NULLS FIRST to the
    // partition head and become a phantom running-last match for
    // every left row with no genuine predecessor (r12 review). Left
    // rows with null ts keep their contract for free once these are
    // gone: nothing sorts before them, so asof is null.
    val rSide = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__ts"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"), lit(0).as("__side"))
    // Right rows sort before left rows at equal ts (inclusive match);
    // equal-ts right rows sort tiebreak-ascending, and the running
    // last() then surfaces the largest tiebreak.
    val ordered: Seq[Column] = (col("__ts").asc +: col("__side").asc +:
      rightTiebreak.map(n => col("__r").getField(n).asc_nulls_first))
    val w = Window.partitionBy("__k")
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.union(rSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }

  /** Per-group top-k with a diversity cap: at most `perKind` rows of
    * any one `kindCol` value inside each group's top-k. (Reference
    * analogue: related-collection ranking keeps the 10 best related
    * collections but at most 2 per collection type —
    * collection-templates airflow/dags/precompute_related.py.)
    *
    * Two rank windows: the first caps each (group, kind) run, the
    * second takes the global top-k of the survivors. Both shuffles key
    * on the group (the second reuses the first's partitioning when
    * groupCols prefix-match), and both run through the rank-limit
    * pushdown (WindowGroupLimit), so no group is ever fully sorted.
    */
  def diverseTopK(df: DataFrame, groupCols: Seq[Column], kindCol: Column,
                  orderCols: Seq[Column], k: Int, perKind: Int): DataFrame = {
    val wKind = Window.partitionBy(groupCols :+ kindCol: _*).orderBy(orderCols: _*)
    val wAll = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("__rk", row_number().over(wKind))
      .filter(col("__rk") <= perKind)
      .withColumn("__rn", row_number().over(wAll))
      .filter(col("__rn") <= k)
      .drop("__rk", "__rn")
  }

  /** Shared-element pair counting over (id, element) edges — the
    * inverted-index core under both the n-gram Jaccard dedup and
    * related-collections ranking: only pairs sharing ≥ 1 element are
    * ever materialized (join volume Σ df² over elements, bounded
    * buckets, never all-pairs), and one aggregation counts each
    * intersection. Returns (id_a, id_b, overlap) with id_a < id_b.
    *
    * `dfCap > 0` drops elements that appear in more than `dfCap` ids
    * before pairing (same df-cut as [[Dedup.shingles]]): one
    * ubiquitous element — the "human"-type category every real
    * dataset has — otherwise contributes a df² bucket that dwarfs
    * every other join task. The skew bound becomes Σ min(df, cap)²,
    * at the declared cost that overlap counts ignore capped elements.
    *
    * SIZING the cap: the largest single join task is ~cap² pairs, so
    * for a per-task pair budget P pick cap ≈ √P — cap = 10⁴ bounds
    * every bucket at 10⁸ candidate pairs (minutes of one core),
    * independent of corpus size. Semantically the cap should sit
    * above the largest df that still DISCRIMINATES (an element shared
    * by 10⁵ ids says nothing about any pair); raising it past that
    * buys cost, not recall. The default 0 (no cap) is for dim-scale
    * inputs only.
    *
    * `boundedDf = true` opts into the collected-array pair generator:
    * pairs are emitted by combinations from each element's collected
    * id array instead of a self-join — born ordered, half the
    * intermediate rows, one fewer exchange. It wins at moderate
    * volume, but its pair construction runs through interpreted
    * higher-order functions and boxed structs, and a K×-data probe
    * measured it degrading super-linearly under memory pressure where
    * the self-join (codegen'd SMJ + spillable aggregation) stayed
    * near-linear — so a dfCap alone keeps the JOIN path (cap as a
    * pre-filter) and the array path is an explicit caller choice for
    * dimension-scale inputs (e.g. capped shingle corpora). Input must
    * be DISTINCT (id, element) pairs (both paths assume it;
    * [[Dedup.shingles]] and the a25 membership set are). Null
    * elements are dropped up front: an equi-join never matches them,
    * and without the filter the array path's groupBy would collect
    * all null-element ids into one group and the two paths would
    * disagree.
    *
    * RUNS JOBS AT CONSTRUCTION when `dfCap > 0`: the over-cap element
    * set is eagerly checkpointed (a real Spark job over the edge
    * aggregation) so the planner can SEE its materialized size and
    * prove the broadcast of the anti-join cut — a plan built from an
    * agg subtree above a shuffle carries no usable size estimate, and
    * on poor-stats sessions the cut otherwise degrades to a full SMJ
    * of the edge stream (measured; see the r7 round log). Plan-
    * inspection tooling that must stay job-free should call with
    * `dfCap = 0` or explain the uncapped plan.
    */
  def overlapPairs(edges: DataFrame, idCol: String,
                   elemCol: String, dfCap: Long = 0L,
                   boundedDf: Boolean = false): DataFrame = {
    val e0raw = edges.select(col(idCol).as("__id"), col(elemCol).as("__el"))
      .filter(col("__el").isNotNull)
    val e0 = if (dfCap <= 0L) e0raw else {
      // Cut as an ANTI join against the OVER-cap element set, not an
      // inner join against the keep set: the keep side is nearly the
      // whole vocabulary (most elements are rare), while the over-cap
      // side is bounded by E/dfCap and in practice tiny.
      //
      // Input contract note: pass a CHECKPOINTED edge frame with
      // dfCap > 0 (the registered callers do) — the eager drop-set
      // job below then reads stored blocks; an un-checkpointed input
      // would be recomputed once for the drop set and once for the
      // probe side.
      //
      // The set is CHECKPOINTED (eager, one small map-side-combinable
      // agg job) before the join on purpose: an agg+filter subtree
      // carries no usable size estimate, so neither the static
      // planner (on a session with poor source stats) nor AQE (whose
      // runtime stats stop at the stage boundary BELOW the agg —
      // measured: the anti join stays a full SMJ of the edge set with
      // static broadcast off) can prove the broadcast. The
      // checkpointed set exposes its TRUE materialized size, so the
      // planner broadcasts exactly when it is genuinely small and
      // falls back to the shuffled join itself when a pathological
      // corpus/low cap makes it large — the size-gated fallback in
      // code, not in hope.
      val drop = e0raw.groupBy("__el").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > dfCap).select("__el").cut()
      e0raw.join(drop, Seq("__el"), "left_anti")
    }
    if (boundedDf) {
      // Bounded-df path: collect each element's id list (the caller
      // vouches the bound, usually alongside a dfCap prefilter) and
      // emit C(df,2) ordered pairs straight from the sorted array —
      // half the intermediate rows of the self-join (pairs are born
      // ordered, id_a < id_b) and one fewer exchange. The per-element
      // aggregation buffer is what the bound protects; NEVER take this
      // path with unbounded groups — one ubiquitous element would
      // build its whole df-sized id array in a single buffer, where
      // the join path merely spills a fat SMJ bucket.
      // Pair emission is the native [[graft.functions.expr
      // .ArrayOrderedPairsGen]] GENERATOR — pairs are born ordered
      // (sorted input) and STREAMED: GenerateExec consumes the lazy
      // iterator inside whole-stage codegen, one reused row, zero
      // per-pair allocation. Three rejected forms, all measured:
      // posexplode-then-slice carried the full ids array on every
      // exploded row (Σ df³ bytes of row copies — 19× wall at 4×
      // data); the flatten(transform(sequence…slice…)) nest evaluated
      // INTERPRETED (higher-order functions are CodegenFallback) with
      // a sliced tail copy per outer index — a25 at sf0.1 read 172 s
      // summed task CPU on that form vs the join path's 49 s; and the
      // ArrayOrderedPairs array expression + explode (the r15 form)
      // materialized every group's full pair array before exploding
      // it — ~7 s of a25's ~21 s restricted task cpu was that
      // build-then-tear-apart (the r15 verdict's named follow-up).
      // The explicit repartition pins the EXPANSION stage's
      // parallelism: pair emission inflates rows ~C(df,2)/df ≈ 10-20×
      // past the lists frame, but AQE sizes the post-agg stage on the
      // lists' INPUT bytes and coalesces it (measured: 4 tasks on 32
      // cores at sf0.1 — 1.75 s of a 5.3 s wall, and each fat task's
      // partial-agg map grows past 100 MB, thrashing cache). A
      // user-specified hash repartition with an EXPLICIT partition
      // count is exempt from AQE coalescing (a count-less repartition
      // still participates — measured: the stage stayed coalesced),
      // and keying it on __el lets the groupBy reuse the exchange —
      // same shuffle count, fixed fan-out.
      e0.repartition(
          edges.sparkSession.sessionState.conf.numShufflePartitions,
          col("__el"))
        .groupBy("__el").agg(sort_array(collect_list(col("__id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expr.ArrayOrderedPairsGen(
            org.apache.spark.sql.graft.ColumnBridge.expression(
              col("ids")))))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("overlap"))
    } else {
      // Unbounded path: inverted-index self-join. Hot elements become
      // fat join buckets (disk-spillable, AQE-splittable) instead of
      // in-memory collect buffers.
      e0.select(col("__el"), col("__id").as("id_a"))
        .join(e0.select(col("__el"), col("__id").as("id_b")), "__el")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("overlap"))
    }
  }

  /** Skew-safe inner equi-join by key salting: each probe-side row
    * gets a deterministic salt in [0, saltFactor) (hash of the whole
    * row, so exact-duplicate rows co-locate but everything else
    * spreads), the build side is replicated across all salt values,
    * and the join keys on (key, salt) — a single hot key fans out over
    * `saltFactor` reducers instead of one.
    *
    * AQE's skew-join handles most sort-merge skew on its own; reach
    * for this when a key is so hot one task still overflows (the
    * replicated side must be the smaller one — replication costs
    * `saltFactor` ×).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    // 0 would null every probe salt (or DIVIDE_BY_ZERO under ANSI)
    // and emit an empty join with no error.
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join: every (point, interval) pair with
    * `start ≤ point ≤ end`, optionally key-scoped by `eqKeys`. Spark
    * plans a bare BETWEEN join predicate as a broadcast-nested-loop /
    * cartesian — quadratic and undistributable. Here both sides map
    * onto fixed-width buckets of the value axis (intervals explode to
    * every bucket they overlap, points to exactly one), the join keys
    * on (eqKeys, bucket) — an ordinary shuffled equi-join with
    * bounded fan-out — and the exact BETWEEN filter runs after. A
    * point's bucket is unique, so each qualifying pair is produced
    * exactly once: no dedup pass.
    *
    * `bucketSize` tunes the trade: interval replication is
    * ⌈len/bucketSize⌉ + 1 rows, while a too-large bucket degrades the
    * post-join filter selectivity. Pick it near the typical interval
    * length. An interval spanning more than `maxBucketsPerInterval`
    * buckets (a corrupt bound, or an open-ended sentinel like
    * end = Long.MaxValue) fails the task with a clear message rather
    * than letting sequence() attempt a billion-element array — cap
    * such intervals upstream or raise `bucketSize`.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, startCol: String, endCol: String,
                bucketSize: Long, eqKeys: Seq[String] = Nil,
                maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // Integral values bucket via exact long floor-division: a
    // cast("double") rounds |v| >= 2^53 (nanosecond-epoch longs), so
    // bucket ids near boundaries shift off their documented value —
    // containment survived only because double rounding is monotone,
    // a property nothing asserted. (v - pmod(v, b)) is an exact
    // multiple of b, so the `div` truncation equals floor division
    // for negatives too. The exact path applies only when ALL THREE
    // value columns are integral: mixing an exact-bucketed side with
    // a double-bucketed side would let the two sides disagree on a
    // bucket id beyond 2^53 and silently drop a matching pair, so a
    // join with any fractional column keeps every side on the same
    // monotone double function. Integral inputs within bucketSize of
    // Long.MinValue would wrap — no real value axis lives there.
    import org.apache.spark.sql.types._
    def integral(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val allIntegral = integral(points, pointCol) &&
      integral(intervals, startCol) && integral(intervals, endCol)
    def withBucket(df: DataFrame, c: String, out: String): DataFrame =
      if (allIntegral)
        df.withColumn("__v", col(c).cast("long"))
          .withColumn(out,
            expr(s"(__v - pmod(__v, ${bucketSize}L)) div ${bucketSize}L"))
          .drop("__v")
      else
        df.withColumn(out, floor(col(c).cast("double") / bucketSize).cast("long"))
    val p = withBucket(points, pointCol, "__bucket")
    val iB = withBucket(withBucket(intervals.filter(col(startCol) <= col(endCol)),
      startCol, "__sb"), endCol, "__eb")
    // Span check in double: a full-axis sentinel interval at
    // bucketSize 1 would overflow long subtraction (MaxValue -
    // MinValue wraps negative and would slip past the guard).
    val guardedEnd = when(
        col("__eb").cast("double") - col("__sb").cast("double")
          < lit(maxBucketsPerInterval.toDouble),
        col("__eb"))
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans >= $maxBucketsPerInterval buckets " +
          s"of size $bucketSize (start="), col(startCol).cast("string"),
        lit(", end="), col(endCol).cast("string"),
        lit("); cap the interval or raise bucketSize"))).cast("long"))
    val i = iB.withColumn("__bucket", explode(sequence(col("__sb"), guardedEnd)))
      .drop("__sb", "__eb")
    p.join(i, Seq("__bucket") ++ eqKeys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Snapshot diff: classify rows of `current` vs `previous` into
    * insert / update / archive / unchanged by full outer join on `key`
    * and comparing `fingerprint` (any deterministic Column over the
    * payload). This is the reference's Elasticsearch sync
    * (scripts/update_elasticsearch.py) as one shuffle instead of a
    * driver-side hash index.
    */
  def diffSnapshots(current: DataFrame, previous: DataFrame,
                    key: String, fingerprint: Column): DataFrame =
    diffSnapshotsCarry(current, previous, key, fingerprint, Nil)

  /** [[diffSnapshots]] carrying named CURRENT-side columns through the
    * classification (null on archive rows — the previous side has no
    * current payload by definition). A sync renderer needs the ops AND
    * the current document fields; re-joining `current` onto the op
    * stream costs a second full shuffle + join of the snapshot — the
    * carry rides the diff's own full-outer join for free (p6's plan:
    * one join, not two). */
  def diffSnapshotsCarry(current: DataFrame, previous: DataFrame,
                         key: String, fingerprint: Column,
                         carry: Seq[String]): DataFrame = {
    val reserved = Set("k", "cur_fp", "prev_fp", "__cur", "__prev", key)
    require(carry.forall(c => !reserved(c)),
      s"diffSnapshotsCarry: carry names collide with the diff's own " +
        s"columns: ${carry.filter(reserved).mkString(", ")}")
    // Row PRESENCE is tracked by explicit markers, not fingerprint
    // nullness — a present row with a NULL fingerprint must classify
    // as update/unchanged (null-safe compare), never as a phantom
    // insert/archive that would drop it from applySnapshotOps.
    // A null key cannot round-trip: equality joins never match null,
    // so it would classify as a phantom insert+archive pair here and
    // then silently VANISH from applySnapshotOps' semi-joins —
    // breaking the pinned round-trip law on exactly the rows least
    // likely to be noticed. Snapshot keys are primary keys; a null
    // one is corrupt input — fail loudly at classification time
    // (r12 review).
    def keyChecked(side: String): Column =
      when(col(key).isNull, raise_error(lit(
        s"diffSnapshots: null $key in the $side snapshot — " +
          "snapshot keys must be non-null")))
        .otherwise(col(key))
    val cur = current.select(Seq(keyChecked("current").as("k"),
      fingerprint.as("cur_fp"), lit(true).as("__cur")) ++
      carry.map(col): _*)
    val prev = previous.select(keyChecked("previous").as("k"),
      fingerprint.as("prev_fp"), lit(true).as("__prev"))
    cur.join(prev, Seq("k"), "full_outer")
      .select(Seq(
        col("k").as(key),
        when(col("__prev").isNull, lit("insert"))
          .when(col("__cur").isNull, lit("archive"))
          .when(!(col("cur_fp") <=> col("prev_fp")), lit("update"))
          .otherwise(lit("unchanged")).as("op")) ++
        carry.map(col): _*)
  }

  /** Apply snapshot-diff operations to a previous state — the
    * state-materialization half of incremental sync (the reference's
    * apply_operations.py executes [[diffSnapshots]]-shaped ops against
    * ES; this is the engine-side equivalent that produces the
    * post-sync snapshot). `ops` must be (key, op) with op ∈
    * insert/update/archive/unchanged over the FULL key space (what
    * diffSnapshots emits): unchanged keys keep their `previous` row,
    * insert/update keys take their `current` row, archived keys drop.
    *
    * Round-trip law (pinned in RelationalExtSpec):
    * `applySnapshotOps(prev, cur, diffSnapshots(cur, prev, k, fp), k)`
    * equals `cur` exactly. Two LEFT SEMI joins against the op table —
    * key-partitioned, no row wider than its source, and `ops` is
    * consumed twice (checkpoint it if its lineage is expensive).
    */
  def applySnapshotOps(previous: DataFrame, current: DataFrame,
                       ops: DataFrame, key: String): DataFrame = {
    val o = ops.select(col(key), col("op"))
    previous.join(o.filter(col("op") === "unchanged").drop("op"),
        Seq(key), "left_semi")
      .unionByName(
        current.join(o.filter(col("op").isin("insert", "update")).drop("op"),
          Seq(key), "left_semi"))
  }

  /** Field-level partial-update documents — the payload half of the
    * incremental sync (reference: update_es.py prepare_update, which
    * walks the UPDATING_FIELDS of a changed document and emits ONLY
    * the fields whose values differ): for every key present in BOTH
    * snapshots, one (key, field, value) row per field whose current
    * value differs from the previous one (null-safe: null→value,
    * value→null and value→value' all emit; equal values — both-null
    * included — do not). Values are compared and emitted as strings,
    * the rendering [[graft.sinks.EsBulk]]-style partial documents
    * use. Keys present on one side only are the insert/archive ops
    * [[diffSnapshots]] classifies — not partial updates.
    *
    * Shape: two zero-shuffle melts (native unpivot — one Expand each)
    * and ONE (key, field) equi-join; nothing is row-wider than its
    * source and the join key is high-cardinality at any scale.
    */
  def partialUpdateDocs(current: DataFrame, previous: DataFrame,
                        key: String): DataFrame = {
    // A field present in only ONE snapshot's schema would melt on one
    // side and silently drop in the inner (key, field) join — a new
    // column's changed values would emit no partial updates at all
    // (r12 review). Schema drift between snapshots is a pipeline
    // deploy event, not a diffable state: fail loudly.
    require(current.columns.toSet == previous.columns.toSet,
      "partialUpdateDocs: snapshots carry different columns — " +
        s"only in current: ${current.columns.toSet.diff(previous.columns.toSet).mkString(", ")}; " +
        s"only in previous: ${previous.columns.toSet.diff(current.columns.toSet).mkString(", ")}")
    def melt(df: DataFrame, as: String): DataFrame = {
      val fields = df.columns.filter(_ != key)
      require(fields.nonEmpty, s"partialUpdateDocs: $key is the only column")
      df.select(col(key) +: fields.map(f => col(f).cast("string").as(f)): _*)
        .unpivot(Array(col(key)), fields.map(col), "field", as)
    }
    melt(current, "value")
      .join(melt(previous, "__prev"), Seq(key, "field"))
      .filter(!(col("value") <=> col("__prev")))
      .select(col(key), col("field"), col("value"))
  }
}
