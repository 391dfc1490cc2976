package graft.queries

import graft.Tables
import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group A (continued) — a9..a20: dedup/merge/diff/metrics, the
  * collection-shaping stages of the reference pipeline
  * (merge_lists_and_categories.py, filter_duplicates.py,
  * merge_collections_ending_with_letters.py, prepare_collections2.py,
  * update_elasticsearch.py) as single-shuffle declarative plans.
  */
object GroupA2 {
  private def dec(c: Column) = c.cast("decimal(18,2)")

  type Q = (SparkSession, String) => DataFrame

  // Synthetic "collection name with letter-range suffix" used by a11 —
  // derived deterministically from part so both engines see the same
  // input (the testdata has no range-suffixed names of its own).
  private val rangedNameSql =
    "concat(p_name, CASE WHEN p_partkey % 3 = 0 THEN ': A' WHEN p_partkey % 3 = 1 THEN ': B' ELSE '' END)"

  val queries: Map[String, Q] = Map(
    // a9: keep the best row per key — uniq_members
    // (prepare_members_names.py:55) keeps the top-ranked duplicate.
    "a9_dedup_first_by_key" -> ((s, d) => {
      Relational.firstByKey(
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice"),
        Seq(col("l_orderkey"), col("l_partkey")),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc))
    }),

    // a10: merge collections sharing a name (filter_duplicates.py):
    // min stable id, max rank, summed counts.
    "a10_merge_by_name" -> ((s, d) => {
      Tables(s, d, "part")
        .groupBy("p_name")
        .agg(min(col("p_partkey")).as("stable_id"),
             max(dec(col("p_retailprice"))).cast("double").as("rank"),
             sum(col("p_size")).as("total_size"),
             count(lit(1)).as("merged_count"))
    }),

    // a11: letter-range suffix merge
    // (merge_collections_ending_with_letters.py): extract the common
    // prefix of "Name: A" / "Name: B" style names, merge onto it.
    // `\z` (absolute end), not `$` (r13 review): Java's `$` also
    // matches BEFORE a trailing line terminator where RE2's does not,
    // so a name like "Foo: A\n" was ranged on the engine and plain in
    // the oracle — both dialects agree on \z, and a trailing-newline
    // name is consistently NOT ranged (names are single-line data; a
    // stray terminator is dirt, not a range marker).
    "a11_merge_letter_ranges" -> ((s, d) => {
      Tables(s, d, "part")
        .withColumn("name", expr(rangedNameSql))
        .withColumn("prefix",
          when(col("name").rlike(": [A-Z]\\z"),
               regexp_replace(col("name"), ": [A-Z]\\z", ""))
            .otherwise(col("name")))
        .groupBy("prefix")
        .agg(count(lit(1)).as("merged_count"),
             min(col("p_partkey")).as("stable_id"))
    }),

    // a12: rule-based collection filtering
    // (merge_lists_and_categories.py:44-75): type denylist, name
    // prefix, and a lowercase-"by" regex.
    "a12_filter_rules" -> ((s, d) => {
      Tables(s, d, "part")
        .filter(!col("p_type").isin("PROMO", "ECONOMY"))
        .filter(!col("p_name").startsWith("old "))
        .filter(!col("p_name").rlike(" by [a-z]"))
        .select("p_partkey", "p_name", "p_type")
    }),

    // a13: snapshot diff → insert/update/archive ops
    // (update_elasticsearch.py) as one full-outer join.
    "a13_diff_snapshots" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      val prev = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("fp"))
      val cur = orders.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, dec(col("o_totalprice")) + dec(lit(10)))
            .otherwise(dec(col("o_totalprice"))).as("fp"))
      Relational.diffSnapshots(cur, prev, "o_orderkey", col("fp"))
        .filter(col("op") =!= "unchanged")
    }),

    // a14: status histogram per group (prepare_collections2.py:97-104)
    // via conditional aggregation — one pass, no pivot shuffle.
    "a14_status_counts" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.groupBy("o_custkey")
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("finished"),
             sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open"),
             sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending"),
             count(lit(1)).as("total"))
    }),

    // a15: per-collection member metrics (prepare_collections2.py:
    // members_rank_mean/median, ratios).
    "a15_metrics_summary" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("qty_mean"),
          median(col("l_quantity")).as("qty_median"),
          (sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("return_ratio"),
          count(lit(1)).as("members"))
    }),

    // a16: the reference's member ordering key
    // log2(rank+1)/max(len(name),10) (prepare_members_names.py:253),
    // ranked per brand. Ordering uses the rounded score so the rank is
    // stable across engines' last-ulp log differences.
    "a16_rank_score" -> ((s, d) => {
      val score = round(
        log(col("p_retailprice") + 1) / log(lit(2.0)) /
          greatest(length(col("p_name")), lit(10)), 6)
      val w = Window.partitionBy("p_brand").orderBy(col("score").desc, col("p_partkey"))
      Tables(s, d, "part")
        .withColumn("score", score)
        .withColumn("brand_rank", row_number().over(w))
        .select("p_partkey", "p_brand", "score", "brand_rank")
    }),

    // a17: curate-name string pipeline (functions.py curate_name +
    // force_normalize:333-356): underscores → spaces, strip
    // "List of "/"Category:", ASCII-fold accented Latin (the
    // unidecode layer), strip punctuation, upper-first. The testdata
    // has no accents, so odd keys deterministically accent a/e/o
    // first — the fold must map them back or the oracle catches it.
    "a17_normalize_names" -> ((s, d) => {
      val raw = concat(lit("List_of_"), regexp_replace(col("p_name"), " ", "_"))
      val spaced = regexp_replace(raw, "_", " ")
      val stripped = regexp_replace(regexp_replace(spaced, "^List of ", ""), "^Category:", "")
      val accented = when(col("p_partkey") % 2 === 1,
        translate(stripped, "aeo", "áéö")).otherwise(stripped)
      val folded = regexp_replace(
        translate(accented,
          "áàâäéèêëíîïóòöôúùüçñ",
          "aaaaeeeeiiioooouuucn"),
        "[^a-zA-Z0-9 ]", "")
      val curated = concat(upper(substring(folded, 1, 1)), substring(folded, 2, 1 << 30))
      Tables(s, d, "part").select(col("p_partkey"), curated.as("name"))
    }),

    // a18: member tokenization (functions.py curate_member): split,
    // normalize to [a-z0-9], drop short tokens, distinct.
    "a18_tokenize_members" -> ((s, d) => {
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("raw"))
        .select(col("doc_id"),
                regexp_replace(lower(col("raw")), "[^a-z0-9]", "").as("token"))
        .filter(length(col("token")) >= 3)
        .distinct()
    }),

    // a19: predicate→column split (create_kv.py db layout) as a pivot
    // with explicit values (no extra pass to discover them).
    "a19_pivot_kv" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
    }),

    // a20: hierarchical rollup statistics (stats_members_type.py).
    // Expressed in SQL: the DataFrame rollup + coalesce-on-grouping-col
    // combination trips DetectAmbiguousSelfJoin (Expand duplicates the
    // grouping attributes); the SQL path has no Dataset-id metadata.
    "a20_rollup_stats" -> ((s, d) => {
      Tables(s, d, "customer").createOrReplaceTempView("g_customer")
      Tables(s, d, "nation").createOrReplaceTempView("g_nation")
      Tables(s, d, "region").createOrReplaceTempView("g_region")
      s.sql(
        """SELECT /*+ BROADCAST(g_nation), BROADCAST(g_region) */
          |  coalesce(r_name, '(all)') AS region,
          |  coalesce(n_name, '(all)') AS nation,
          |  count(*) AS cnt,
          |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS acctbal_sum
          |FROM g_customer
          |JOIN g_nation ON c_nationkey = n_nationkey
          |JOIN g_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    }),
  )

  val oracles: Map[String, String] = Map(
    "a9_dedup_first_by_key" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                       ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "a10_merge_by_name" ->
      """SELECT p_name, min(p_partkey) AS stable_id,
        |  cast(max(cast(p_retailprice AS decimal(18,2))) AS double) AS rank,
        |  cast(sum(p_size) AS bigint) AS total_size, count(*) AS merged_count
        |FROM part GROUP BY 1""".stripMargin,

    "a11_merge_letter_ranges" ->
      s"""WITH named AS (
         |  SELECT p_partkey, $rangedNameSql AS name FROM part)
         |SELECT CASE WHEN regexp_matches(name, ': [A-Z]\\z')
         |            THEN regexp_replace(name, ': [A-Z]\\z', '')
         |            ELSE name END AS prefix,
         |  count(*) AS merged_count, min(p_partkey) AS stable_id
         |FROM named GROUP BY 1""".stripMargin,

    "a12_filter_rules" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type NOT IN ('PROMO', 'ECONOMY')
        |  AND p_name NOT LIKE 'old %'
        |  AND NOT regexp_matches(p_name, ' by [a-z]')""".stripMargin,

    "a13_diff_snapshots" ->
      """WITH prev AS (
        |  SELECT o_orderkey, cast(o_totalprice AS decimal(18,2)) AS fp
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |cur AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN cast(o_totalprice AS decimal(18,2)) + cast(10 AS decimal(18,2))
        |         ELSE cast(o_totalprice AS decimal(18,2)) END AS fp
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(cur.o_orderkey, prev.o_orderkey) AS o_orderkey,
        |  CASE WHEN prev.fp IS NULL THEN 'insert'
        |       WHEN cur.fp IS NULL THEN 'archive'
        |       WHEN cur.fp <> prev.fp THEN 'update'
        |       ELSE 'unchanged' END AS op
        |FROM cur FULL OUTER JOIN prev ON cur.o_orderkey = prev.o_orderkey
        |WHERE (CASE WHEN prev.fp IS NULL THEN 'insert'
        |            WHEN cur.fp IS NULL THEN 'archive'
        |            WHEN cur.fp <> prev.fp THEN 'update'
        |            ELSE 'unchanged' END) <> 'unchanged'""".stripMargin,

    "a14_status_counts" ->
      """SELECT o_custkey,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS finished,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS open,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS pending,
        |  count(*) AS total
        |FROM orders GROUP BY 1""".stripMargin,

    "a15_metrics_summary" ->
      """SELECT l_orderkey,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS qty_mean,
        |  median(l_quantity) AS qty_median,
        |  cast(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS double) / count(*) AS return_ratio,
        |  count(*) AS members
        |FROM lineitem GROUP BY 1""".stripMargin,

    "a16_rank_score" ->
      """WITH scored AS (
        |  SELECT p_partkey, p_brand,
        |    round(ln(p_retailprice + 1) / ln(2.0) /
        |          greatest(length(p_name), 10), 6) AS score
        |  FROM part)
        |SELECT p_partkey, p_brand, score,
        |  cast(row_number() OVER (PARTITION BY p_brand
        |                          ORDER BY score DESC, p_partkey) AS int) AS brand_rank
        |FROM scored""".stripMargin,

    "a17_normalize_names" ->
      """WITH raw AS (
        |  SELECT p_partkey,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(concat('List_of_', regexp_replace(p_name, ' ', '_', 'g')),
        |                       '_', ' ', 'g'),
        |        '^List of ', ''),
        |      '^Category:', '') AS s
        |  FROM part),
        |acc AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 2 = 1 THEN translate(s, 'aeo', 'áéö') ELSE s END AS s
        |  FROM raw),
        |folded AS (
        |  SELECT p_partkey,
        |    regexp_replace(translate(s, 'áàâäéèêëíîïóòöôúùüçñ',
        |                                'aaaaeeeeiiioooouuucn'),
        |                   '[^a-zA-Z0-9 ]', '', 'g') AS s
        |  FROM acc)
        |SELECT p_partkey, concat(upper(substr(s, 1, 1)), substr(s, 2)) AS name
        |FROM folded""".stripMargin,

    "a18_tokenize_members" ->
      """SELECT DISTINCT doc_id, token FROM (
        |  SELECT doc_id,
        |    regexp_replace(lower(unnest(string_split(text, ' '))), '[^a-z0-9]', '', 'g') AS token
        |  FROM documents)
        |WHERE length(token) >= 3""".stripMargin,

    "a19_pivot_kv" ->
      """SELECT user_id,
        |  cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS bigint) AS click,
        |  cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS bigint) AS view,
        |  cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint) AS purchase,
        |  cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS bigint) AS signup,
        |  cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS bigint) AS error
        |FROM events GROUP BY 1""".stripMargin,

    "a20_rollup_stats" ->
      """SELECT coalesce(r_name, '(all)') AS region,
        |  coalesce(n_name, '(all)') AS nation,
        |  count(*) AS cnt,
        |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
  )
}
