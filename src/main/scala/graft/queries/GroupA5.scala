package graft.queries

import graft.Tables
import graft.functions.Text
import graft.operators.Checkpoints.Cuttable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group A (continued) — round-14 additions closing the last two
  * reference stages without a named SparkEntry row:
  *
  *  - a41: wordninja-style dictionary segmentation of member names +
  *    per-collection token counts (collections-preprocessing/src/
  *    preprocessing_service.py:8-27 — every name is lowercased and
  *    DP-split into dictionary words, and the collection gets a
  *    token → count map, model.py:23-33 AugmentedCollection;
  *    expected splits pinned by the reference's own
  *    collections-preprocessing/src/test_main.py and by
  *    WordSegmentSpec). The engine form: a corpus-derived
  *    unigram-frequency dictionary as ONE broadcast dim row
  *    (Text.segmentDict — Zipf costs in exact integer micro-ln
  *    units), the DP as a narrow codegen expression
  *    ([[graft.functions.expr.WordSegment]]) — no shuffle beyond the
  *    dim fit and the count aggregation. The DuckDB oracle replays
  *    the IDENTICAL DP in a recursive CTE over the same integer cost
  *    dim, so segmentation is hash-gated, not merely spec'd.
  *
  *  - a42: the collection-seed extraction stage (scripts/
  *    create_lists.py:27-47 — §1 pipeline step 3, the one batch stage
  *    with no named query): iterate the entity→predicates KV maps
  *    (db3 ↔ c2's first-wins predicate maps), keep entities whose map
  *    carries the mode's predicate, look the article name up in the
  *    id→title map (db1 ↔ a label dim; a missing id is the
  *    reference's KeyError → skip, an inner join), then the mode's
  *    prefix rule: category mode KEEPS only `Category:`-prefixed
  *    articles, list mode DROPS `Lists_of:`-prefixed ones. Both modes
  *    in one frame with a mode column — pure composition of
  *    registered capabilities (c2 + a2 + a12), named so the stage
  *    itself is oracled.
  */
object GroupA5 {
  type Q = (SparkSession, String) => DataFrame

  // a41's glued names, derived deterministically from part (same
  // expression both engines): spaces removed so the in-dictionary
  // words are concatenated (the ENS-style input the reference's
  // service faces), every 3rd name uppercased (the service lowercases
  // before splitting), every 5th suffixed with two out-of-dictionary
  // characters (exercising the unknown-char penalty path through the
  // hash gate, not just the spec).
  private val gluedNameSql =
    """CASE WHEN p_partkey % 3 = 0 THEN upper(replace(p_name, ' ', ''))
      |     ELSE replace(p_name, ' ', '') END ||
      |CASE WHEN p_partkey % 5 = 0 THEN 'q7' ELSE '' END"""
      .stripMargin.replace("\n", " ")

  // a42's article labels, derived deterministically from customer:
  // ids ≡ 0 (mod 7) are ABSENT from the label dim (the KeyError→skip
  // branch); prefixes cover both mode rules.
  private val articleSql =
    """CASE WHEN c_custkey % 4 = 0 THEN 'Category:' || c_name
      |     WHEN c_custkey % 4 = 1 THEN 'Lists_of:' || c_name
      |     ELSE c_name END""".stripMargin.replace("\n", " ")

  /** a41's registered dictionary dim for `dir` (corpus token
    * frequencies → Zipf micro-ln costs, ONE row) — split out so
    * ScaleProbe can hold the dict FIXED while scaling names. */
  def segmentDictOf(s: SparkSession, d: String): DataFrame =
    Text.segmentDict(
      Tables(s, d, "part")
        .select(explode(split(col("p_name"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt")),
      "tok", "cnt")

  /** a41's registered input wiring — the glued (coll, p_partkey,
    * name) frame — shared with ScaleProbe so the probe's derivation
    * cannot drift from the registered query's. */
  def segmentNamesInput(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "part").select(col("p_partkey"),
      expr("p_partkey DIV 20").as("coll"),
      expr(gluedNameSql).as("name"))

  /** a41's registered body over an arbitrary (coll, p_partkey, name)
    * frame + the 1-row dict dim (the rankCorrelationOf no-lookalike
    * pattern: ScaleProbe drives THIS, so the probed plan is the
    * served plan): broadcast the dim onto every name, run the DP
    * expression, aggregate per-collection token counts, render them
    * canonically, join back per collection. */
  /** The segmentation stage itself — dict broadcast onto every name,
    * the DP expression inside codegen. Split out pre-cut because this
    * is the plan the eager checkpoint in [[segmentNamesOf]] executes:
    * PlanSpec pins the broadcast + codegen-span contract on THIS
    * frame (the executed sub-plan), which the registered body builds
    * through the same definition so the pinned plan cannot drift. */
  def segmentedOf(names: DataFrame, dict: DataFrame): DataFrame =
    names.crossJoin(broadcast(dict))
      .select(col("coll"), col("p_partkey"), col("name"),
        Text.segmentName(col("name"), col("dict"), col("max_word"))
          .as("__t"))

  /** Render "tok:cnt,…" (tokens ascending, binary order — DuckDB's
    * `string_agg(… ORDER BY tok)` under its default binary collation)
    * from a SORTED token array, as ONE `aggregate` fold: runs of equal
    * tokens accumulate a count, a token change appends "tok:cnt" to
    * the entries array, and the finisher flushes the last run. Empty
    * array → empty string (the reference's test_empty contract: a
    * collection whose every name segments to nothing keeps its rows
    * with empty counts).
    *
    * WHY a fold and not index arithmetic: higher-order functions
    * evaluate INTERPRETED (CodegenFallback) with no common-
    * subexpression elimination, so any Column passed into a lambda
    * body is re-evaluated at every reference of every element — an
    * index-based formulation (filter(sequence(0,n-1), …) over
    * element_at(ts, i)) re-ran the upstream sort+flatten once per
    * element reference, turning a linear render into minutes of CPU
    * at 64x names (measured; killed). In a fold, `ts` appears exactly
    * once (the aggregate input, evaluated once per row) and the
    * accumulator is a bound lambda variable, so the pass is genuinely
    * linear in tokens — plus O(distinct²) accumulator-array pointer
    * copies, bounded by tokens-per-collection (names-scale by
    * contract, same bound the per-coll collect_list already imposes). */
  private def renderSortedCounts(ts: Column): Column = {
    def flush(st: Column): Column =
      array_append(st.getField("entries"),
        concat(st.getField("cur"), lit(":"),
          st.getField("cnt").cast("string")))
    val folded = aggregate(
      ts,
      struct(array().cast("array<string>").as("entries"),
        lit("").as("cur"), lit(0L).as("cnt")),
      (st, t) => when(st.getField("cnt") === lit(0L),
          struct(st.getField("entries").as("entries"), t.as("cur"),
            lit(1L).as("cnt")))
        .when(t === st.getField("cur"),
          struct(st.getField("entries").as("entries"),
            st.getField("cur").as("cur"),
            (st.getField("cnt") + 1L).as("cnt")))
        .otherwise(struct(flush(st).as("entries"), t.as("cur"),
          lit(1L).as("cnt"))),
      st => when(st.getField("cnt") === lit(0L), lit(""))
        .otherwise(concat_ws(",", flush(st))))
    folded
  }

  def segmentNamesOf(names: DataFrame, dict: DataFrame): DataFrame = {
    // ONE consumer of the segmented frame, by construction: the whole
    // collection is packed in a single groupBy(coll) aggregation, the
    // counts render once per collection from the packed token arrays,
    // and the name rows explode back out. Three rejected forms, all
    // measured (sf0.1 bench + the 64x-names probe, interleaved
    // same-session where the host phase allowed):
    //  - counts-branch + join-back (the original): Catalyst does not
    //    dedupe common subplans across join inputs, so every name ran
    //    the DP once per branch — and the explode's inferred
    //    size(__t)>0 filter pushed down INTO the dict broadcast
    //    join's condition, evaluating graft_segment a THIRD time per
    //    row. This form still reads within-band at 64x under heavy
    //    host noise (the DP is cheap on the SYNTHETIC dictionary:
    //    max_word ~9 vs wordninja's production 24), but pays 3x the
    //    DP and two extra shuffles ((coll, tok) pairs + the join).
    //  - localCheckpoint cut of the segmented frame: one DP, but the
    //    whole segmented corpus becomes deserialized executor blocks
    //    — GC pressure at 64x names read 3-10x the join form's wall
    //    in the same phase (13-50 s vs 4.5-13 s) with wild variance.
    //  - repartition(coll) shared-exchange: per-branch column pruning
    //    specializes the two subplans, exchange reuse never fires —
    //    two full shuffles AND the duplicated DP.
    // This form shuffles each name row exactly once, runs the DP
    // exactly once, and holds no blocks. Per-reducer state is one
    // collection's names+tokens — the same bound the old counts
    // aggregation already had via its per-coll collect_list. The
    // render projection sits BELOW the explode (Generate keeps its
    // required child output; CollapseProject does not merge across
    // it), so it evaluates once per collection, not once per name —
    // PlanSpec pins the single scan and the render-below-Generate
    // shape.
    val packed = segmentedOf(names, dict)
      .groupBy(col("coll"))
      .agg(collect_list(struct(col("p_partkey"), col("name"), col("__t")))
        .as("rows"))
    // Both filters matter: null ARRAYS (a name whose __t is null) and
    // null ELEMENTS. segmentName never emits null tokens today, but
    // renderSortedCounts null-propagates on a null element (t === cur
    // evaluates to null → the otherwise branch flushes with cur=null →
    // concat yields a null entry, silently corrupting coll_counts) —
    // so the element filter turns that implicit upstream contract into
    // a structural guarantee a future tokenizer change cannot break.
    val ts = array_sort(filter(flatten(filter(
      transform(col("rows"), r => r.getField("__t")), x => x.isNotNull)),
      t => t.isNotNull))
    packed
      .select(col("coll"), col("rows"),
        renderSortedCounts(ts).as("coll_counts"))
      .select(col("coll"), col("coll_counts"), explode(col("rows")).as("r"))
      .select(col("coll"), col("r.p_partkey").as("p_partkey"),
        col("r.name").as("name"),
        concat_ws(" ", col("r.__t")).as("tokens"),
        size(col("r.__t")).cast("long").as("n_tokens"),
        col("coll_counts"))
  }

  val queries: Map[String, Q] = Map(
    // a41: dictionary fit (dim-sized, one broadcast row) → narrow DP
    // segmentation per name → per-collection token counts. The
    // counts are ALSO rendered as one canonical "tok:cnt,…" string
    // per collection and attached to every name row, so one hash
    // covers both reference outputs (tokenized_names AND
    // tokenized_names_counts). Scale: the dictionary is a vocabulary
    // (dim by definition); segmentation is per-row compute inside
    // codegen; the one corpus-sized shuffle is the pack-by-collection
    // aggregation (see segmentNamesOf for the three rejected
    // alternatives and their measurements).
    "a41_segment_names" -> ((s, d) =>
      segmentNamesOf(segmentNamesInput(s, d), segmentDictOf(s, d))),

    // a42: predicate-presence filter over the KV maps (c2's exact
    // frame — composed, not restated) + label lookup + mode prefix
    // rules. BOTH modes run in ONE pass: a per-entity 2-element
    // explode (mode, predicate value) instead of two unioned branches
    // — a union of two kv.filter(...) branches would evaluate the
    // corpus-sized KV aggregation AND the label join TWICE (Catalyst
    // does not dedupe common subplans — the r4 p1 lesson). The label
    // join is corpus×corpus at reference scale (db1 maps EVERY
    // entity to its title), so no broadcast hint: the predicate
    // filter upstream is selective and AQE picks the strategy from
    // true sizes.
    "a42_collection_seeds" -> ((s, d) => {
      val kv = GroupC.queries("c2_group_entity")(s, d)
      val labels = Tables(s, d, "customer")
        .filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("item"), expr(articleSql).as("article"))
      kv.select(col("user_id"), explode(array(
          struct(lit("category").as("mode"), col("first_click").as("seed_type")),
          struct(lit("list").as("mode"), col("first_view").as("seed_type"))))
          .as("m"))
        .select(col("user_id"), col("m.mode").as("mode"),
          col("m.seed_type").as("seed_type"))
        .filter(col("seed_type").isNotNull)
        .join(labels, col("user_id") === col("item"))
        .filter(
          (col("mode") === "category" &&
            col("article").startsWith("Category:")) ||
          (col("mode") === "list" &&
            !col("article").startsWith("Lists_of:")))
        .select(col("mode"), col("item"), col("seed_type"), col("article"))
    }),
  )

  val oracles: Map[String, String] = Map(
    // The oracle replays the ENTIRE a41 computation: the same integer
    // cost dim (rank by count DESC/token, cost = round(ln(rank·lnV)
    // ·1e6)), the same DP (min over (cost, k) structs ≡ the
    // expression's ascending-k strict '<'), the same backtrack, the
    // same count rendering. Integer costs make every compared value
    // exact — no float summation-order risk anywhere in the DP.
    "a41_segment_names" ->
      s"""WITH RECURSIVE
         |toks AS (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part),
         |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
         |dict AS (
         |  SELECT tok,
         |    cast(round(ln(row_number() OVER (ORDER BY cnt DESC, tok)
         |                  * ln((SELECT count(*) FROM freq))) * 1000000)
         |         AS bigint) AS cost_u
         |  FROM freq),
         |dm AS (SELECT map(list(tok), list(cost_u)) AS m,
         |              max(length(tok)) AS maxw FROM dict),
         |names AS (
         |  SELECT p_partkey, p_partkey // 20 AS coll,
         |         $gluedNameSql AS name
         |  FROM part),
         |dp AS (
         |  SELECT p_partkey, lower(name) AS s, length(name) AS n, 0 AS i,
         |    cast([0] AS BIGINT[]) AS costs, cast([0] AS INT[]) AS lens
         |  FROM names
         |  UNION ALL
         |  SELECT p_partkey, s, n, i + 1,
         |    list_append(costs, best['c']),
         |    list_append(lens, cast(best['k'] AS INT))
         |  FROM (
         |    SELECT dp.*,
         |      list_min(list_transform(range(1, least(i + 1, dm.maxw) + 1), k ->
         |        {'c': costs[i - k + 2] +
         |              coalesce(dm.m[s[i - k + 2 : i + 1]][1],
         |                       CASE WHEN k = 1 THEN 25000000
         |                            ELSE 1000000000000000 END),
         |         'k': k})) AS best
         |    FROM dp, dm WHERE i < n)),
         |fin AS (SELECT p_partkey, s, n, lens FROM dp WHERE i = n),
         |back AS (
         |  SELECT p_partkey, s, lens, n AS i, cast([] AS VARCHAR[]) AS tks
         |  FROM fin
         |  UNION ALL
         |  SELECT p_partkey, s, lens, i - lens[i + 1],
         |    list_prepend(s[i - lens[i + 1] + 1 : i], tks)
         |  FROM back WHERE i > 0),
         |seg AS (SELECT p_partkey, tks FROM back WHERE i = 0),
         |counts AS (
         |  SELECT coll, tok, count(*) AS cnt FROM (
         |    SELECT n.coll, unnest(g.tks) AS tok
         |    FROM names n JOIN seg g USING (p_partkey))
         |  GROUP BY 1, 2),
         |cstr AS (
         |  SELECT coll, string_agg(tok || ':' || cnt, ',' ORDER BY tok)
         |           AS coll_counts
         |  FROM counts GROUP BY 1)
         |SELECT n.coll, n.p_partkey, n.name,
         |  array_to_string(g.tks, ' ') AS tokens,
         |  len(g.tks) AS n_tokens,
         |  coalesce(cstr.coll_counts, '') AS coll_counts
         |FROM names n
         |JOIN seg g USING (p_partkey)
         |LEFT JOIN cstr USING (coll)""".stripMargin,

    "a42_collection_seeds" ->
      s"""WITH kv AS (
         |  SELECT user_id,
         |    min_by(value, event_id) FILTER (WHERE event_type = 'click')
         |      AS first_click,
         |    min_by(value, event_id) FILTER (WHERE event_type = 'view')
         |      AS first_view
         |  FROM events GROUP BY 1),
         |labels AS (
         |  SELECT c_custkey AS item, $articleSql AS article
         |  FROM customer WHERE c_custkey % 7 <> 0)
         |SELECT 'category' AS mode, item, first_click AS seed_type, article
         |FROM kv JOIN labels ON user_id = item
         |WHERE first_click IS NOT NULL
         |  AND starts_with(article, 'Category:')
         |UNION ALL
         |SELECT 'list', item, first_view, article
         |FROM kv JOIN labels ON user_id = item
         |WHERE first_view IS NOT NULL
         |  AND NOT starts_with(article, 'Lists_of:')""".stripMargin,
  )
}
