package graft.queries

import graft.operators.Checkpoints.Cuttable
import graft.Tables
import graft.operators.{Relational, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group A (continued) — round-3 additions covering the reference
  * pipeline stages that had no standalone query yet:
  *
  *  - a24: relation-based category→list merge
  *    (merge_lists_and_categories.py:116-147 merges a category into its
  *    related list via the explicit P1753/P1754 wikidata relation
  *    BEFORE falling back to the equal-name merge).
  *  - a26: deterministic banner/emoji assignment
  *    (prepare_collections2.py:63-65,120-121 — seeded-PRNG banner
  *    number and type-priority emoji pick).
  *  - a27: collection-name log-probability
  *    (prepare_collections2.py:164, ngrams.sequence_log_probability —
  *    unigram frequency model over the corpus).
  *  - a28: keyword extraction from redirects
  *    (prepare_members_names.py — the names of redirect pages pointing
  *    at a member become its search keywords).
  *  - a29: range/interval join through Relational.rangeJoin's
  *    bucketized equi-join (generalizes the reference's score/QRank
  *    banding joins; a bare BETWEEN join would plan as a nested loop).
  *
  * All are deterministic over the testdata so DuckDB replays them
  * exactly: the "random" banner is an md5 bucket (same expression
  * both engines), the unigram model is derived from the same corpus it
  * scores, and the relation/redirect/interval tables are derived from
  * part and orders.
  */
object GroupA4 {
  type Q = (SparkSession, String) => DataFrame

  // a34's emoji-decorated names, derived deterministically from part
  // (same expression both engines): emoji glued to a word, emoji runs
  // replacing spaces, a skin-tone modifier and a ZWJ family sequence.
  private val emojiNameSql =
    """CASE WHEN p_partkey % 4 = 0 THEN '🔥' || p_name
      |     WHEN p_partkey % 4 = 1 THEN replace(p_name, ' ', '🧡💛')
      |     WHEN p_partkey % 4 = 2 THEN p_name || ' 👍🏽 👨‍👩‍👧'
      |     ELSE p_name END""".stripMargin

  /** a37's registered body (shared with ScaleProbe so the probe runs
    * the served plan, not a lookalike): per-collection Spearman rho
    * between the two total orders (s1 desc, member) and (s2 desc,
    * member) of a (coll, member, s1, s2) frame. Both row_number
    * windows partition on coll, so Catalyst plans ONE exchange with
    * two sorts over it; Σd² stays exact integer arithmetic and the
    * only float op is rho's final division (no corr() accumulation-
    * order drift). Reference: research/sort_members/sort.py:15-20. */
  /** a37's registered INPUT wiring — the per-(coll, member) score
    * collapse — shared with ScaleProbe so the probe's input
    * derivation cannot drift from the registered query's (the same
    * no-lookalike rule the shared body enforces for the plan). */
  def rankCorrelationInput(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("coll"), col("l_partkey").as("member"))
      .agg(max(col("l_extendedprice").cast("decimal(18,2)")).as("s1"),
           max(col("l_quantity")).as("s2"))

  def rankCorrelationOf(m: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy("coll").orderBy(col("s1").desc, col("member"))
    val w2 = Window.partitionBy("coll").orderBy(col("s2").desc, col("member"))
    m.withColumn("r1", row_number().over(w1))
      .withColumn("r2", row_number().over(w2))
      .groupBy("coll")
      .agg(count(lit(1)).as("n_members"),
        // Difference squared in DECIMAL (r13 overflow sweep; the
        // original int d*d wrapped past |d| > 46340, the long form
        // past Σd² > 9.2e18 — a 2.1e6-member collection's worst-case
        // reversal, reachable at 100 TB): decimal(18,0)² →
        // decimal(37,0), the sum fits decimal(38,0) exactly.
        sum((col("r1") - col("r2")).cast("decimal(18,0)") *
            (col("r1") - col("r2")).cast("decimal(18,0)"))
          .as("__sd2"))
      .filter(col("n_members") >= 2)
      .select(col("coll").as("o_orderkey"), col("n_members"),
        // The n(n²−1) denominator in DECIMAL too: the long form
        // overflowed at n > 2.09e6 members (³√2^63). decimal(12,0)
        // operands keep the product exact to n = 1e12; the division
        // is the same final double expression either way.
        round(lit(1.0) - lit(6.0) * col("__sd2") /
          (col("n_members").cast("decimal(12,0)") *
            (col("n_members").cast("decimal(12,0)") *
              col("n_members").cast("decimal(12,0)") - 1)), 6)
          .as("spearman"))
  }

  /** a38's registered body (research/custom-collections/
    * analyze-ranks.py — the rank-distribution audit run before
    * trusting a custom-collection batch): three rank series —
    * per-collection rank, per-collection MEAN member rank, and
    * per-collection MAX member rank with the arg-max member in the
    * label (the reference's "collection / member" key) — each
    * described as pandas .describe() does (n, mean, std, min,
    * p25/p50/p75, max) plus the nlargest(10) labels.
    *
    * Determinism contract (the hash gate): every value is quantized
    * to CENTS (an exact long) before any aggregation, so sums and
    * sums-of-squares are exact decimal integer arithmetic on both
    * engines; mean/std are computed from those exact moments with
    * identical final double expressions, and percentiles use the
    * exact (n−1)p interpolation both engines share (the f7 pattern).
    * Arg-max ties break on the smallest member id (the struct-max
    * (rank, −member) on the Spark side ≡ the (rank DESC, member)
    * window on the oracle side). Scale note (same declaration as
    * f7): exact percentile and the per-series top-10 sort are the
    * oracle-able forms; at 100 TB the same shape runs
    * approx_percentile and keeps topKPerGroup, which already windows
    * per series. */
  def rankDescribeOf(s: SparkSession, d: String,
                     approxQuartiles: Boolean = false): DataFrame =
    rankDescribe(
      Tables(s, d, "orders")
        .select(col("o_orderkey").as("coll"),
          col("o_totalprice").cast("decimal(18,2)").as("r")),
      Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("coll"), col("l_partkey").as("member"))
        .agg(max(col("l_extendedprice").cast("decimal(18,2)")).as("rank")),
      approxQuartiles)

  /** Core of a38 over a (coll, r) collection-rank frame and a
    * (coll, member, rank) member-rank frame — split from the table
    * wiring so ScaleProbe runs the registered plan on K× inputs. */
  /** `approxQuartiles = true` runs the DECLARED 100 TB quartile form —
    * `percentile_approx` (bounded-memory KLL-style sketch, map-side
    * combinable, no per-series total sort) — through the otherwise
    * identical body. Drift vs the exact form is interpolation-shaped:
    * the sketch returns an actual element where the exact form
    * interpolates between the two boundary elements, so the gap is
    * bounded by one inter-element spacing at each quartile (measured
    * at sf0.1 by graft.tools.ApproxDrift; ApproxDriftSpec pins the
    * bound executable at sf0.001). n, mean, std, min, max and top10
    * are byte-identical between the forms. */
  def rankDescribe(collRanks0: DataFrame, mem0: DataFrame,
                   approxQuartiles: Boolean = false): DataFrame = {
    // pandas-describe semantics for the PUBLIC body: null ranks drop
    // at the door (impossible on the registered tables). Found by
    // review of the quartile rework: the sort window ranks null
    // v_cents FIRST where the replaced percentile() skipped them, so
    // without this filter every boundary ordinal would shift by the
    // null count; filtering inputs (not v_cents) also keeps n, the
    // moments and the mean-series denominator consistent.
    val collRanks = collRanks0.filter(col("r").isNotNull)
    val mem = mem0.filter(col("rank").isNotNull)
    // One exchange on coll serves count, exact sum, and the arg-max
    // struct; the reference skips collections without members, hence
    // the semi-join gating the collection-rank series.
    // Cut: three branches consume perColl with DIFFERENT column
    // prunings (coll alone for the semi-join, (nm, rsum), (mx)), so
    // ReuseExchange cannot dedupe them and the lineitem collapse
    // would re-execute per branch without the checkpoint.
    val perColl = mem.groupBy("coll").agg(
      count(lit(1)).as("nm"),
      sum(col("rank")).as("rsum"),
      max(struct(col("rank").as("r"), (-col("member")).as("negm"))).as("mx"))
      .cut()
    val collRank = collRanks
      .join(perColl.select("coll"), Seq("coll"), "left_semi")
      .select(lit("collection_rank").as("series"),
        col("coll").cast("string").as("label"),
        (col("r") * 100).cast("long").as("v_cents"))
    // Mean cents by integer half-up division — (2·tc + n) div (2·n) —
    // so the quantization itself never touches a double (a
    // round(double, 2) here disagreed between engines on rounding
    // edges: ±1 cent on a handful of collections, caught by the
    // moments).
    val meanRank = perColl.select(lit("mean_member_rank").as("series"),
      col("coll").cast("string").as("label"),
      expr("CAST((2 * CAST(rsum * 100 AS BIGINT) + nm) DIV (2 * nm) AS BIGINT)")
        .as("v_cents"))
    val maxRank = perColl.select(lit("max_member_rank").as("series"),
      concat(col("coll").cast("string"), lit("/"),
        (-col("mx.negm")).cast("string")).as("label"),
      (col("mx.r") * 100).cast("long").as("v_cents"))
    // The union feeds three consumers (moments agg, quartile ordinals
    // window, top-10 window); cut so none recomputes the upstream
    // collapse (Catalyst does not dedupe common subplans across the
    // union's reuse).
    val series = collRank.unionByName(meanRank).unionByName(maxRank).cut()
    // Moments: every agg here is declarative (decimal sums, min/max)
    // so the plan stays a codegen HashAggregate with map-side
    // partials. The percentiles deliberately do NOT use the
    // `percentile` expression: that agg forces the whole stats
    // aggregate into ObjectHashAggregate buffering a per-partition
    // value-count map that cannot spill — the sort-window form below
    // reads the same three quartiles through sort-based machinery
    // that can (measured on the checkpointed sf0.1 frame: body 2.64 s
    // vs 3.04, 16× probe ratio 6.94 vs 8.50 — a modest win locally,
    // the spill-safety is the scale argument).
    val stats = series.groupBy("series").agg(
      count(lit(1)).as("n"),
      sum(col("v_cents").cast("decimal(38,0)")).as("sc"),
      sum((col("v_cents") * col("v_cents")).cast("decimal(38,0)")).as("sq"),
      min(col("v_cents")).as("mn"),
      max(col("v_cents")).as("mxv"))
    // Exact (n−1)p interpolated quartiles via ONE sort window per
    // series: each row learns its ordinal and the series size, only
    // the ≤4 boundary rows per quartile survive the filter, and the
    // interpolation runs in the final 3-row select. Bit-identical to
    // the `percentile`/quantile_cont pair this replaces: v_cents is
    // an integer and p ∈ {1/4, 1/2, 3/4} is dyadic, so idx, frac,
    // and lo + frac·(hi − lo) are all EXACT doubles — no formula-
    // order sensitivity. (Scale declaration unchanged from f7: the
    // exact form is the oracle form; at 100 TB the same shape runs
    // approx_percentile — a per-series total sort does not scale.)
    import org.apache.spark.sql.expressions.Window
    val posW = Window.partitionBy("series").orderBy("v_cents")
    val quart = Seq(0.25 -> "25", 0.5 -> "50", 0.75 -> "75")
    def qidx(p: Double) = (col("n") - 1).cast("double") * lit(p)
    val ordinals = series.select("series", "v_cents")
      .withColumn("pos", row_number().over(posW))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("series")))
    val qagg = ordinals
      .filter(quart.map { case (p, _) =>
        col("pos") === (floor(qidx(p)) + 1) ||
          col("pos") === (ceil(qidx(p)) + 1) }.reduce(_ || _))
      .groupBy("series")
      .agg(
        max(when(col("pos") === (floor(qidx(0.25)) + 1), col("v_cents"))).as("lo25"),
        max(when(col("pos") === (ceil(qidx(0.25)) + 1), col("v_cents"))).as("hi25"),
        max(when(col("pos") === (floor(qidx(0.5)) + 1), col("v_cents"))).as("lo50"),
        max(when(col("pos") === (ceil(qidx(0.5)) + 1), col("v_cents"))).as("hi50"),
        max(when(col("pos") === (floor(qidx(0.75)) + 1), col("v_cents"))).as("lo75"),
        max(when(col("pos") === (ceil(qidx(0.75)) + 1), col("v_cents"))).as("hi75"))
    def interp(p: Double, t: String) = {
      val idx = (col("n") - 1).cast("double") * lit(p)
      val frac = idx - floor(idx)
      col(s"lo$t") + frac * (col(s"hi$t") - col(s"lo$t"))
    }
    // The approx twin replaces ONLY the quartile branch: one
    // bounded-memory sketch agg on the same checkpointed series (no
    // ordinals window, no boundary filter); accuracy 10000 = the
    // Spark default relative rank error of 1/10000.
    val statsQ =
      if (approxQuartiles)
        stats.join(
          series.groupBy("series").agg(percentile_approx(col("v_cents"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qa")),
          "series")
          .withColumn("q25", col("qa")(0).cast("double"))
          .withColumn("q50", col("qa")(1).cast("double"))
          .withColumn("q75", col("qa")(2).cast("double"))
      else stats.join(qagg, "series")
        .withColumn("q25", interp(0.25, "25"))
        .withColumn("q50", interp(0.5, "50"))
        .withColumn("q75", interp(0.75, "75"))
    val top = Relational.topKPerGroup(series, Seq(col("series")),
        Seq(col("v_cents").desc, col("label").asc), k = 10, rankCol = "rn")
      .groupBy("series")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("label")))),
        x => x("label")), ",").as("top10"))
    statsQ.join(top, "series").select(
      col("series"), col("n"),
      round(col("sc").cast("double") / col("n") / 100, 6).as("mean"),
      // Sample std is NULL for a 1-value series (stddev_samp
      // semantics): without the guard the (n−1) division is an ANSI
      // DIVIDE_BY_ZERO — unreachable on the registered tables, found
      // by the PropertySpec brute-force on random frames.
      round(when(col("n") > 1, sqrt(greatest(
          (col("sq").cast("double") -
            col("sc").cast("double") * col("sc").cast("double") / col("n"))
            / (col("n") - 1), lit(0.0))) / 100), 6).as("std"),
      round(col("mn") / lit(100.0), 6).as("vmin"),
      round(col("q25") / 100, 6).as("p25"),
      round(col("q50") / 100, 6).as("p50"),
      round(col("q75") / 100, 6).as("p75"),
      round(col("mxv") / lit(100.0), 6).as("vmax"),
      col("top10"))
  }

  val queries: Map[String, Q] = Map(
    "a38_rank_describe" -> ((s, d) => rankDescribeOf(s, d)),

    // a39: dump order audit (research/parsing-wiki-dumps/is_sorted.py
    // — the pre-flight check that a dump is sorted by its key before
    // anything binary-searches or merge-joins it; the reference
    // scans the CSV once and exits at the first out-of-order pair).
    // Engine form: ONE window pass per stream (user) checks the
    // event time is monotone along the declared sequence (event_id)
    // and reports each stream's violation count and first violating
    // id — the whole-corpus answer the single-pass scan cannot give.
    // The generator emits events already sorted (0 natural
    // violations = a trivially-empty oracle), so the audited column
    // plants deterministic late-arrivals — event_id % 101 == 0 rows
    // shifted an hour early — the same planted-fixture pattern as
    // a13's % diffs and b7's planted cycles; both engines apply the
    // identical expression. Epoch-seconds arithmetic per the G-family
    // parity contract.
    "a39_sort_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, d, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          (col("ts").cast("long") -
            when(col("event_id") % 101 === 0, 3600L).otherwise(0L)).as("es"))
        .withColumn("prev_es", lag(col("es"), 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("prev_es") > col("es"), 1L).otherwise(0L))
            .as("n_violations"),
          min(when(col("prev_es") > col("es"), col("event_id")))
            .as("first_violation_id"))
        .filter(col("n_violations") > 0)
    }),

    // a40: corpus snapshot comparison (research/parsing-wiki-dumps/
    // compare-members.py — the two-dump audit run before swapping a
    // new wiki parse in: per-side collection counts, mean member
    // counts, and which collections exist in only one side). Engine
    // form: two derived membership snapshots (a13's % filters), one
    // exact-moment aggregate per side (mean as cents by the a38
    // integer half-up division), anti-joins both ways for the
    // only-in counts, and the reference's arbitrary [30:60] id slice
    // becomes the DETERMINISTIC 30 smallest ids (orderBy+limit plans
    // as TakeOrderedAndProject — no global sort materialized). All
    // 1-row branches; the final assembly is broadcast cross-joins.
    "a40_snapshot_compare" -> ((s, d) => {
      val mem = Tables(s, d, "lineitem")
        .select(col("l_orderkey").as("coll"), col("l_partkey").as("member"))
      def collsOf(f: DataFrame): DataFrame =
        f.distinct().groupBy("coll").agg(count(lit(1)).as("nm"))
      // (Par.both on these two collapses and on the anti-join legs
      // below was TRIED this round and REVERTED: cpu rose disjointly
      // ~4.7→7.8-9.0 s at overlapping wall — two concurrent
      // distinct-shuffles over one scan thrash allocation, the W3
      // mechanism — and the cpu inflation would poison the driver's
      // lower-core leg.)
      val c1 = collsOf(mem.filter(col("coll") % 3 =!= 0)).cut()
      val c2 = collsOf(mem.filter(col("coll") % 5 =!= 0)).cut()
      def sideStats(c: DataFrame, tag: String): DataFrame =
        c.agg(count(lit(1)).as(s"n_colls_$tag"),
          expr("CAST((2 * sum(nm) * 100 + count(1)) DIV (2 * count(1)) " +
            "AS BIGINT)").as(s"mean_members_c_$tag"))
      def onlyIn(a: DataFrame, b: DataFrame, tag: String): DataFrame = {
        val only = a.select("coll")
          .join(b.select("coll"), Seq("coll"), "left_anti").cut()
        val sample = only.orderBy("coll").limit(30)
          .agg(concat_ws(",", sort_array(collect_list(col("coll"))))
            .as(s"sample_only_$tag"))
        only.agg(count(lit(1)).as(s"n_only_$tag")).crossJoin(sample)
      }
      sideStats(c1, "1").crossJoin(sideStats(c2, "2"))
        .crossJoin(onlyIn(c1, c2, "1"))
        .crossJoin(onlyIn(c2, c1, "2"))
    }),

    // a34: emoji-aware name tokenization (load_custom_collections.py:
    // 126-158): emoji survive as their own tokens — ZWJ sequences and
    // skin-tone modifiers as ONE token — while the text between them
    // splits on the reference's [a-zA-Z0-9']+ rule (a18's plain
    // tokenizer strips emoji entirely). Narrow regexp projection,
    // zero shuffle; the n_emoji count re-tests tokens against the
    // pictograph class.
    "a34_emoji_tokenize" -> ((s, d) => {
      import graft.functions.Text
      Tables(s, d, "part")
        .select(col("p_partkey"), expr(emojiNameSql).as("name"))
        .select(col("p_partkey"), col("name"),
          Text.emojiTokens(col("name")).as("__t"))
        .select(col("p_partkey"), col("name"),
          concat_ws(",", col("__t")).as("tokens"),
          size(col("__t")).cast("long").as("n_tokens"),
          size(filter(col("__t"), t => t.rlike("^" + Text.emojiClass)))
            .cast("long").as("n_emoji"))
    }),
    // a35: collection-name prefix/suffix mining (research/collection-
    // name-normalization/most-popular-prefixes.py & -suffixes.py): the
    // leading and trailing token runs (length 1..2) of every name,
    // frequency-counted with a min-count cut — the upstream that
    // produces the suspicious-affix denylists a12 consumes as given.
    // One narrow fan-out (≤ 4 grams per name) + one map-side-
    // combinable (kind, gram) aggregation; example = min name for a
    // deterministic counterpart of the reference's example list.
    "a35_affix_mining" -> ((s, d) => {
      val staged = Tables(s, d, "part")
        .select(col("p_name"), split(col("p_name"), " ").as("t"))
        .select(col("p_name"), col("t"),
          explode(sequence(lit(1), least(lit(2), size(col("t"))))).as("i"))
      staged.select(col("p_name"), explode(array(
          struct(lit("prefix").as("kind"),
            array_join(slice(col("t"), lit(1), col("i")), " ").as("gram")),
          struct(lit("suffix").as("kind"),
            array_join(slice(col("t"), -col("i"), col("i")), " ").as("gram"))))
          .as("g"))
        .groupBy(col("g.kind").as("kind"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as("cnt"), min(col("p_name")).as("example"))
        .filter(col("cnt") >= 2)
    }),

    // a24: collections = part rows; odd keys play "category", even keys
    // play "list"; categories k ≡ 1 (mod 4) relate to list k+1 and
    // k ≡ 3 (mod 4) to list k-1 (the P1753/P1754 edge stand-in), so a
    // list ℓ ≡ 2 (mod 4) absorbs BOTH neighbours and — like the
    // reference's merge_collections, which keeps min(category.item,
    // list.item) — survives under the LEAST merged id (ℓ-1, a category
    // id smaller than the list's). Stage 1 merges each related
    // category onto its list (the list's NAME survives, the min id
    // wins); stage 2 name-merges the survivors — exactly the
    // reference's merge order. The remap table is dim-sized →
    // broadcast; both aggregations are map-side combinable.
    "a24_merge_by_relation" -> ((s, d) => {
      val p = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"),
          col("p_retailprice").cast("decimal(18,2)").as("rankd"))
      val cats = p.filter(col("p_partkey") % 4 === 1)
        .select(col("p_partkey").as("category_id"),
          (col("p_partkey") + 1).as("list_id"))
        .unionByName(p.filter(col("p_partkey") % 4 === 3)
          .select(col("p_partkey").as("category_id"),
            (col("p_partkey") - 1).as("list_id")))
      val rel = cats.join(p.filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("list_id")), "list_id")
      // Same least-id merge semantics as Collections.build, one
      // definition (a24 skips the sound-edge guard by construction:
      // lists are even keys, categories odd — no chains possible).
      val remap = graft.operators.Collections.mergeRemap(rel)
      val grouped = p
        .join(broadcast(remap), p("p_partkey") === col("old_id"), "left")
        .withColumn("gid", coalesce(col("new_id"), col("p_partkey")))
      val stage1 = grouped.groupBy("gid")
        .agg(coalesce(max(when(col("p_partkey") % 2 === 0, col("p_name"))),
               max(col("p_name"))).as("name"),
             sum(col("p_size")).as("size"),
             max(col("rankd")).as("rankd"),
             count(lit(1)).as("cnt"))
      stage1.groupBy("name")
        .agg(min(col("gid")).as("stable_id"),
             sum(col("size")).as("total_size"),
             max(col("rankd")).cast("double").as("rank"),
             sum(col("cnt")).as("merged_count"))
    }),

    // a26: banner number = md5 bucket of the collection id (both
    // engines compute the identical expression — the reference seeds a
    // PRNG with the item id, which is the same "deterministic hash of
    // the id" contract); emoji = the RAREST of the collection's types
    // (the reference's get_emoji sorts types ASCENDING by emoji count
    // and takes the first, with types missing from the emoji table
    // sorting last via sys.maxsize — prepare_collections2.py:120), via
    // a broadcast frequency dim + one rank-1 window. The frequency dim
    // deliberately omits the globally most frequent type, so the
    // missing-sorts-last branch is exercised by the oracle too: a
    // collection whose ONLY type is the omitted one still gets it.
    "a26_assign_banner_emoji" -> ((s, d) => {
      val o = Tables(s, d, "orders").select("o_custkey", "o_orderpriority")
      val freqsAll = o.groupBy("o_orderpriority").agg(count(lit(1)).as("freq"))
      val top1 = Relational.firstByKey(freqsAll, Seq(lit(1)),
        Seq(col("freq").desc, col("o_orderpriority").asc))
        .select("o_orderpriority")
      val freqs = freqsAll.join(top1, Seq("o_orderpriority"), "left_anti")
      val best = Relational.firstByKey(
        o.distinct().join(broadcast(freqs), Seq("o_orderpriority"), "left"),
        Seq(col("o_custkey")),
        Seq(col("freq").asc_nulls_last, col("o_orderpriority").asc))
      best.select(
        col("o_custkey"),
        Sampling.hashBucket(col("o_custkey"), 20).as("banner_number"),
        col("o_orderpriority").as("top_type"),
        concat(lit("emoji_"),
          regexp_replace(lower(col("o_orderpriority")), "[^a-z0-9]+", "_"))
          .as("emoji"))
    }),

    // a27: unigram log-probability of each part name under the model
    // derived from the whole name corpus: p(tok) = cnt/total,
    // score = Σ ln p. Frequencies are a broadcast dim; each ln is
    // rounded to 9 dp so both engines sum bit-identical terms (libm
    // vs JVM last-ulp differences), the sum to 6.
    "a27_name_logprob" -> ((s, d) => {
      // toks feeds BOTH the vocabulary fit and the scoring join, so
      // the scan+split+explode runs once per branch (r14 scan audit:
      // part x3). Adjudicated and left UNCUT deliberately: a cut was
      // measured LOSING on both wall and cpu (interleaved A/B,
      // tools/abtest_27794a6_*.json) — materializing the exploded
      // (key, tok) rows costs more than re-running a pruned columnar
      // scan plus a split, at any scale where tokenization is this
      // cheap. Contrast f8/f10, where the duplicated branch carries a
      // corpus-wide aggregation or the full tokenizer and the cut
      // wins.
      val toks = Tables(s, d, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum(col("cnt")).as("total"))
      toks.join(broadcast(freq), "tok")
        .crossJoin(broadcast(total))
        .groupBy("p_partkey")
        .agg(round(sum(round(log(col("cnt").cast("double") / col("total")), 9)), 6)
               .as("log_prob"),
             count(lit(1)).as("n_tokens"))
    }),

    // a28: members = part keys divisible by 4; every other part key
    // "redirects" to the member at the floor of its 4-block — its name
    // becomes one of the member's keywords. Many-to-one collect join:
    // left join (so keyword-less members survive with an empty list),
    // sorted-set keywords rendered as a canonical csv string so the
    // hash compare is dialect-stable. The aggregation is map-side
    // combinable and keys on the member id — at scale this is one
    // shuffle of (member, keyword) pairs.
    "a28_member_keywords" -> ((s, d) => {
      val p = Tables(s, d, "part").select(col("p_partkey"), col("p_name"))
      val redirects = p.filter(col("p_partkey") % 4 =!= 0)
        .select((col("p_partkey") - col("p_partkey") % 4).as("target"),
          col("p_name").as("kw"))
      p.filter(col("p_partkey") % 4 === 0)
        .join(redirects, col("p_partkey") === col("target"), "left")
        .groupBy("p_partkey")
        .agg(max(col("p_name")).as("name"),
             concat_ws(",", sort_array(collect_set(col("kw")))).as("keywords"),
             countDistinct(col("kw")).as("n_keywords"))
    }),

    // a29: range (interval) join — each part's price point matched to
    // every order-derived interval covering it, via the bucketized
    // equi-join (Relational.rangeJoin; a bare BETWEEN join predicate
    // would plan as a nested loop). Aggregated per point so the
    // compare stays compact; floor() on both engines (Spark's
    // double→bigint cast truncates, DuckDB's rounds — floor agrees).
    "a29_range_join" -> ((s, d) => {
      val pts = Tables(s, d, "part")
        .select(col("p_partkey"), floor(col("p_retailprice")).as("v"))
      val ivals = Tables(s, d, "orders")
        .select(col("o_orderkey").as("iid"),
          (lit(900) + col("o_orderkey") % 1100).as("s"))
        .withColumn("e", col("s") + 40)
      // bucketSize 8, not 64 (r17, guide §2.5): the value axis is
      // only ~1100 wide, so 64-wide buckets gave ~18 distinct join
      // keys — AQE coalesced the bucket join to ~1 task, and every
      // interval was tested against the points of a (40+64)-wide
      // candidate window. 8-wide buckets raise the key count to
      // ~140 (parallel across all 32 partitions) and shrink the
      // candidate window to (40+8) — ~2.2× fewer pair tests. Result
      // rows are IDENTICAL: bucketization is physical routing only,
      // the exact [s, e] containment filter decides membership.
      Relational.rangeJoin(pts, ivals, "v", "s", "e", bucketSize = 8L)
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_intervals"), min(col("iid")).as("min_iid"))
    }),

    // a31: apply snapshot-diff ops back onto the previous state — the
    // other half of a13's incremental sync (reference:
    // apply_operations.py executes the op stream against ES; the
    // engine materializes the post-sync snapshot). Same synthetic
    // snapshots as a13, so the reconstructed state must equal the
    // current snapshot exactly — the round-trip is ALSO pinned as a
    // spec; the oracle proves the op-application semantics
    // independently.
    "a31_apply_ops" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      val prev = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("fp"))
      val cur = orders.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, dec(col("o_totalprice")) + dec(lit(10)))
            .otherwise(dec(col("o_totalprice"))).as("fp"))
      // Checkpointed: applySnapshotOps consumes ops twice and the
      // full-outer diff join should not execute twice (the operator's
      // own doc contract).
      val ops = Relational.diffSnapshots(cur, prev, "o_orderkey", col("fp"))
        .cut()
      Relational.applySnapshotOps(prev, cur, ops, "o_orderkey")
        .select(col("o_orderkey"), col("fp").cast("double").as("fp"))
    }),

    // a36: field-level partial-update documents — the payload half of
    // the ES sync (update_es.py prepare_update): for keys present in
    // both snapshots, emit ONLY the fields whose values changed
    // (null-safe). Two-field wide snapshots derived from orders; the
    // price changes on %7 keys, the status on %11 keys, so single-
    // field, both-field and no-op update shapes all occur.
    "a36_partial_updates" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      val prev = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("price"),
          col("o_orderstatus").as("status"))
      val cur = orders.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, dec(col("o_totalprice")) + dec(lit(10)))
            .otherwise(dec(col("o_totalprice"))).as("price"),
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("status"))
      Relational.partialUpdateDocs(cur, prev, "o_orderkey")
    }),

    // a32: unpivot/melt — the inverse of a19's KV pivot: wide columns
    // back to (key, metric, value) rows, the shape the reference's ES
    // sync renders partial-update documents in (update_elasticsearch
    // .py emits per-field maps). Native `unpivot` — one Expand over
    // the projection, no shuffle at all.
    "a32_unpivot" -> ((s, d) => {
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "value")
    }),

    // a37: per-collection rank correlation between two member
    // orderings (research/sort_members/sort.py:15-20 — `spear`
    // compares the rank-ordering vs the interesting-score ordering of
    // each collection's members with Spearman's rho to pick the
    // serving sort). Orderings are made TOTAL (score desc, member id
    // asc), so ranks are the permutations row_number assigns and rho
    // has the closed form 1 − 6·Σd²/(n(n²−1)) — Σd² is an EXACT
    // integer on both engines, so the only float op is one final
    // division (no corr() accumulation-order drift). Plan shape: the
    // two windows share one partition key, so Catalyst plans ONE
    // exchange on coll with two sorts over it; the final agg is
    // map-side combinable.
    "a37_rank_correlation" -> ((s, d) =>
      rankCorrelationOf(rankCorrelationInput(s, d))),

    // a30: multi-granularity stats in ONE pass — CUBE over
    // (event_type, cohort) computes the per-cell, both per-margin and
    // grand-total aggregates the reference derives in separate
    // passes/dicts (stats_members_type.py keeps per-type AND total
    // counters). grouping_id() disambiguates a real NULL key from an
    // aggregated-away one; Spark plans cube as one Expand + single
    // aggregation (map-side combinable), not 4 scans.
    "a30_cube_stats" -> ((s, d) => {
      Tables(s, d, "events")
        .select(col("event_type"), (col("user_id") % 10).as("cohort"),
          col("value"))
        .cube(col("event_type"), col("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
          grouping_id().as("gid"))
    }),
  )

  val oracles: Map[String, String] = Map(
    // a38: cents-quantized moments are exact integer sums on both
    // engines; the only float ops are the shared final expressions
    // (mean/std from exact moments, the (n−1)p percentile
    // interpolation, one round). Arg-max: (rank DESC, member) row 1
    // ≡ Spark's max(struct(rank, −member)).
    "a38_rank_describe" ->
      """WITH mem AS (
        |  SELECT l_orderkey AS coll, l_partkey AS member,
        |    max(cast(l_extendedprice AS decimal(18,2))) AS rank
        |  FROM lineitem GROUP BY 1, 2),
        |pc AS (
        |  SELECT coll, count(*) AS nm, sum(rank) AS rsum
        |  FROM mem GROUP BY 1),
        |mx AS (
        |  SELECT coll, rank AS r, member FROM (
        |    SELECT coll, rank, member,
        |      row_number() OVER (PARTITION BY coll
        |                         ORDER BY rank DESC, member) AS rn
        |    FROM mem) WHERE rn = 1),
        |ser AS (
        |  SELECT 'collection_rank' AS series,
        |    cast(o_orderkey AS varchar) AS label,
        |    cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
        |      AS v_cents
        |  FROM orders WHERE o_orderkey IN (SELECT coll FROM pc)
        |  UNION ALL
        |  SELECT 'mean_member_rank', cast(coll AS varchar),
        |    cast((2 * cast(rsum * 100 AS bigint) + nm) // (2 * nm)
        |         AS bigint)
        |  FROM pc
        |  UNION ALL
        |  SELECT 'max_member_rank',
        |    cast(coll AS varchar) || '/' || cast(member AS varchar),
        |    cast(r * 100 AS bigint)
        |  FROM mx),
        |stats AS (
        |  SELECT series, cast(count(*) AS bigint) AS n,
        |    sum(cast(v_cents AS decimal(38,0))) AS sc,
        |    sum(cast(v_cents * v_cents AS decimal(38,0))) AS sq,
        |    min(v_cents) AS mn, max(v_cents) AS mxv,
        |    quantile_cont(v_cents, 0.25) AS q25,
        |    quantile_cont(v_cents, 0.5) AS q50,
        |    quantile_cont(v_cents, 0.75) AS q75
        |  FROM ser GROUP BY 1),
        |top AS (
        |  SELECT series, string_agg(label, ',' ORDER BY rn) AS top10
        |  FROM (SELECT series, label,
        |          row_number() OVER (PARTITION BY series
        |                             ORDER BY v_cents DESC, label) AS rn
        |        FROM ser) WHERE rn <= 10
        |  GROUP BY 1)
        |SELECT s.series, s.n,
        |  round(cast(s.sc AS double) / s.n / 100, 6) AS mean,
        |  round(CASE WHEN s.n > 1 THEN sqrt(greatest(
        |      (cast(s.sq AS double)
        |        - cast(s.sc AS double) * cast(s.sc AS double) / s.n)
        |        / (s.n - 1), 0.0)) / 100 END, 6) AS std,
        |  round(s.mn / 100.0, 6) AS vmin,
        |  round(s.q25 / 100, 6) AS p25,
        |  round(s.q50 / 100, 6) AS p50,
        |  round(s.q75 / 100, 6) AS p75,
        |  round(s.mxv / 100.0, 6) AS vmax,
        |  t.top10
        |FROM stats s JOIN top t USING (series)""".stripMargin,

    // a39: epoch-seconds + the planted-perturbation expression are
    // identical on both engines; event_id is unique, so the lag
    // order is total.
    "a39_sort_audit" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    cast(floor(epoch(ts)) AS bigint)
        |      - CASE WHEN event_id % 101 = 0 THEN 3600 ELSE 0 END AS es
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (
        |  SELECT user_id, event_id, es,
        |    lag(es) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS prev_es
        |  FROM e)
        |SELECT user_id, cast(count(*) AS bigint) AS n_events,
        |  cast(coalesce(sum(CASE WHEN prev_es > es THEN 1 ELSE 0 END), 0)
        |    AS bigint) AS n_violations,
        |  min(CASE WHEN prev_es > es THEN event_id END)
        |    AS first_violation_id
        |FROM m GROUP BY 1
        |HAVING coalesce(sum(CASE WHEN prev_es > es THEN 1 ELSE 0 END), 0) > 0
        |""".stripMargin,

    // a40: counts and integer-division means are exact on both
    // engines; the sample strings join the 30 smallest ids.
    "a40_snapshot_compare" ->
      """WITH m1 AS (
        |  SELECT DISTINCT l_orderkey AS coll, l_partkey AS member
        |  FROM lineitem WHERE l_orderkey % 3 <> 0),
        |m2 AS (
        |  SELECT DISTINCT l_orderkey AS coll, l_partkey AS member
        |  FROM lineitem WHERE l_orderkey % 5 <> 0),
        |c1 AS (SELECT coll, count(*) AS nm FROM m1 GROUP BY 1),
        |c2 AS (SELECT coll, count(*) AS nm FROM m2 GROUP BY 1),
        |s1 AS (SELECT cast(count(*) AS bigint) AS n_colls_1,
        |         cast((2 * sum(nm) * 100 + count(*)) // (2 * count(*))
        |           AS bigint) AS mean_members_c_1 FROM c1),
        |s2 AS (SELECT cast(count(*) AS bigint) AS n_colls_2,
        |         cast((2 * sum(nm) * 100 + count(*)) // (2 * count(*))
        |           AS bigint) AS mean_members_c_2 FROM c2),
        |o1 AS (SELECT coll FROM c1 WHERE coll NOT IN (SELECT coll FROM c2)),
        |o2 AS (SELECT coll FROM c2 WHERE coll NOT IN (SELECT coll FROM c1)),
        |d1 AS (SELECT cast(count(*) AS bigint) AS n_only_1 FROM o1),
        |d2 AS (SELECT cast(count(*) AS bigint) AS n_only_2 FROM o2),
        |x1 AS (SELECT coalesce(string_agg(cast(coll AS varchar), ','
        |                ORDER BY coll), '') AS sample_only_1
        |       FROM (SELECT coll FROM o1 ORDER BY coll LIMIT 30)),
        |x2 AS (SELECT coalesce(string_agg(cast(coll AS varchar), ','
        |                ORDER BY coll), '') AS sample_only_2
        |       FROM (SELECT coll FROM o2 ORDER BY coll LIMIT 30))
        |SELECT * FROM s1, s2, d1, x1, d2, x2""".stripMargin,

    // a37: Σd² over row_number ranks is exact integer arithmetic on
    // both engines (HUGEINT here ↔ decimal(38,0) on the Spark side —
    // the r13 overflow sweep; the bare BIGINT forms wrapped/threw at
    // 100 TB collection sizes); rho's one division replays
    // bit-for-bit.
    "a37_rank_correlation" ->
      """WITH m AS (
        |  SELECT l_orderkey AS coll, l_partkey AS member,
        |    max(cast(l_extendedprice AS decimal(18,2))) AS s1,
        |    max(l_quantity) AS s2
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT coll, member,
        |    row_number() OVER (PARTITION BY coll ORDER BY s1 DESC, member) AS r1,
        |    row_number() OVER (PARTITION BY coll ORDER BY s2 DESC, member) AS r2
        |  FROM m)
        |SELECT coll AS o_orderkey,
        |  cast(count(*) AS bigint) AS n_members,
        |  round(1.0 - 6.0 * sum(cast(r1 - r2 AS hugeint) * (r1 - r2))
        |          / (cast(count(*) AS hugeint)
        |             * (cast(count(*) AS hugeint) * count(*) - 1)), 6) AS spearman
        |FROM r GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "a36_partial_updates" ->
      """WITH prev AS (
        |  SELECT o_orderkey,
        |    cast(cast(o_totalprice AS decimal(18,2)) AS string) AS price,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |cur AS (
        |  SELECT o_orderkey,
        |    cast(CASE WHEN o_orderkey % 7 = 0
        |         THEN cast(o_totalprice AS decimal(18,2)) + cast(10 AS decimal(18,2))
        |         ELSE cast(o_totalprice AS decimal(18,2)) END AS string) AS price,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS status
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |mc AS (SELECT o_orderkey, 'price' AS field, price AS value FROM cur
        |       UNION ALL SELECT o_orderkey, 'status', status FROM cur),
        |mp AS (SELECT o_orderkey, 'price' AS field, price AS pv FROM prev
        |       UNION ALL SELECT o_orderkey, 'status', status FROM prev)
        |SELECT mc.o_orderkey, mc.field, mc.value
        |FROM mc JOIN mp USING (o_orderkey, field)
        |WHERE mc.value IS DISTINCT FROM mp.pv""".stripMargin,

    "a35_affix_mining" ->
      """WITH toks AS (SELECT p_name, string_split(p_name, ' ') AS t FROM part),
        |fan AS (SELECT p_name, t,
        |          unnest(generate_series(1, least(2, len(t)))) AS i
        |        FROM toks),
        |grams AS (
        |  SELECT 'prefix' AS kind, array_to_string(t[1:i], ' ') AS gram, p_name
        |  FROM fan
        |  UNION ALL
        |  SELECT 'suffix', array_to_string(t[len(t)-i+1:len(t)], ' '), p_name
        |  FROM fan)
        |SELECT kind, gram, count(*) AS cnt, min(p_name) AS example
        |FROM grams GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "a34_emoji_tokenize" -> {
      // The regex literals are shared with the Spark side ([[graft
      // .functions.Text]]); only the SQL quote escaping differs.
      val tok = graft.functions.Text.emojiTokenRe.replace("'", "''")
      val cls = graft.functions.Text.emojiClass.replace("'", "''")
      s"""WITH named AS (SELECT p_partkey, $emojiNameSql AS name FROM part),
         |t AS (SELECT p_partkey, name,
         |        regexp_extract_all(name, '$tok') AS toks FROM named)
         |SELECT p_partkey, name,
         |  array_to_string(toks, ',') AS tokens,
         |  cast(len(toks) AS bigint) AS n_tokens,
         |  cast(len(list_filter(toks, x -> regexp_matches(x, '^$cls'))) AS bigint) AS n_emoji
         |FROM t""".stripMargin
    },
    "a32_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS metric, cast(c_acctbal AS double) AS value
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey' AS metric, cast(c_nationkey AS double) AS value
        |FROM customer""".stripMargin,

    "a31_apply_ops" ->
      """WITH prev AS (
        |  SELECT o_orderkey, cast(o_totalprice AS decimal(18,2)) AS fp
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |cur AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN cast(o_totalprice AS decimal(18,2)) + cast(10 AS decimal(18,2))
        |         ELSE cast(o_totalprice AS decimal(18,2)) END AS fp
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT coalesce(cur.o_orderkey, prev.o_orderkey) AS k,
        |    cur.fp AS cfp, prev.fp AS pfp,
        |    CASE WHEN prev.fp IS NULL THEN 'insert'
        |         WHEN cur.fp IS NULL THEN 'archive'
        |         WHEN cur.fp <> prev.fp THEN 'update'
        |         ELSE 'unchanged' END AS op
        |  FROM cur FULL OUTER JOIN prev ON cur.o_orderkey = prev.o_orderkey)
        |SELECT k AS o_orderkey, cast(pfp AS double) AS fp FROM d WHERE op = 'unchanged'
        |UNION ALL
        |SELECT k AS o_orderkey, cast(cfp AS double) AS fp FROM d
        |WHERE op IN ('insert', 'update')""".stripMargin,

    "a30_cube_stats" ->
      """SELECT event_type, cohort, count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,2))) AS double) AS value_sum,
        |  cast(GROUPING(event_type, cohort) AS bigint) AS gid
        |FROM (SELECT event_type, user_id % 10 AS cohort, value FROM events)
        |GROUP BY CUBE (event_type, cohort)""".stripMargin,

    "a24_merge_by_relation" ->
      """WITH p AS (SELECT p_partkey, p_name, p_size,
        |             cast(p_retailprice AS decimal(18,2)) AS rankd FROM part),
        |rel AS (SELECT c.p_partkey AS category_id, c.p_partkey + 1 AS list_id
        |        FROM p c JOIN p l ON l.p_partkey = c.p_partkey + 1
        |        WHERE c.p_partkey % 4 = 1 AND l.p_partkey % 2 = 0
        |        UNION ALL
        |        SELECT c.p_partkey, c.p_partkey - 1
        |        FROM p c JOIN p l ON l.p_partkey = c.p_partkey - 1
        |        WHERE c.p_partkey % 4 = 3 AND l.p_partkey % 2 = 0),
        |merged AS (SELECT list_id, least(list_id, min(category_id)) AS new_id
        |           FROM rel GROUP BY 1),
        |remap AS (SELECT category_id AS old_id, new_id
        |          FROM rel JOIN merged USING (list_id)
        |          UNION ALL SELECT list_id, new_id FROM merged),
        |g1 AS (SELECT coalesce(r.new_id, p.p_partkey) AS gid,
        |         coalesce(max(CASE WHEN p.p_partkey % 2 = 0 THEN p.p_name END),
        |                  max(p.p_name)) AS name,
        |         cast(sum(p.p_size) AS bigint) AS size,
        |         max(rankd) AS rankd, count(*) AS cnt
        |       FROM p LEFT JOIN remap r ON p.p_partkey = r.old_id
        |       GROUP BY 1)
        |SELECT name, min(gid) AS stable_id,
        |  cast(sum(size) AS bigint) AS total_size,
        |  cast(max(rankd) AS double) AS rank,
        |  cast(sum(cnt) AS bigint) AS merged_count
        |FROM g1 GROUP BY 1""".stripMargin,

    "a26_assign_banner_emoji" ->
      """WITH cand AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders),
        |freqs_all AS (SELECT o_orderpriority, count(*) AS freq
        |              FROM orders GROUP BY 1),
        |top1 AS (SELECT o_orderpriority FROM freqs_all
        |         ORDER BY freq DESC, o_orderpriority LIMIT 1),
        |freqs AS (SELECT * FROM freqs_all WHERE o_orderpriority NOT IN
        |            (SELECT o_orderpriority FROM top1)),
        |best AS (SELECT o_custkey, o_orderpriority FROM (
        |  SELECT cand.o_custkey, cand.o_orderpriority,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY freq ASC NULLS LAST, o_orderpriority) AS rn
        |  FROM cand LEFT JOIN freqs USING (o_orderpriority)) WHERE rn = 1)
        |SELECT o_custkey,
        |  ('0x' || substr(md5(cast(o_custkey AS varchar)), 1, 8))::BIGINT % 20
        |    AS banner_number,
        |  o_orderpriority AS top_type,
        |  'emoji_' || regexp_replace(lower(o_orderpriority), '[^a-z0-9]+', '_', 'g')
        |    AS emoji
        |FROM best""".stripMargin,

    "a27_name_logprob" ->
      """WITH toks AS (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok
        |              FROM part),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |total AS (SELECT sum(cnt) AS total FROM freq)
        |SELECT p_partkey,
        |  round(sum(round(ln(cnt * 1.0 / total), 9)), 6) AS log_prob,
        |  count(*) AS n_tokens
        |FROM toks JOIN freq USING (tok) CROSS JOIN total
        |GROUP BY 1""".stripMargin,

    "a29_range_join" ->
      """SELECT p.p_partkey,
        |  count(*) AS n_intervals,
        |  min(i.iid) AS min_iid
        |FROM (SELECT p_partkey, floor(p_retailprice) AS v FROM part) p
        |JOIN (SELECT o_orderkey AS iid,
        |             900 + o_orderkey % 1100 AS s,
        |             900 + o_orderkey % 1100 + 40 AS e FROM orders) i
        |  ON p.v >= i.s AND p.v <= i.e
        |GROUP BY 1""".stripMargin,

    "a28_member_keywords" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part),
        |red AS (SELECT p_partkey - p_partkey % 4 AS target, p_name AS kw
        |        FROM p WHERE p_partkey % 4 <> 0)
        |SELECT p.p_partkey, max(p.p_name) AS name,
        |  coalesce(string_agg(DISTINCT kw, ',' ORDER BY kw), '') AS keywords,
        |  count(DISTINCT kw) AS n_keywords
        |FROM p LEFT JOIN red ON p.p_partkey = red.target
        |WHERE p.p_partkey % 4 = 0
        |GROUP BY 1""".stripMargin,
  )
}
