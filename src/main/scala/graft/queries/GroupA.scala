package graft.queries

import graft.Tables
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group A — relational core: the joins / sorts / group-bys the
  * reference pipeline performs with RocksDB lookups, `LC_ALL=C sort`
  * and streaming Python loops, re-expressed as declarative Spark plans.
  *
  * Numeric convention (oracle parity): money/quantity sums go through
  * decimal(18,2) so Spark and DuckDB aggregate exactly, then cast to
  * double for the final column. Counts stay BIGINT. See SURVEY.md §6.
  */
object GroupA {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // a1: multi-aggregate scan — the pipeline's dump statistics
    // (Makefile stats targets) as one whole-stage-codegen'd pass.
    "a1_agg_stats" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .withColumn("avg_qty", col("sum_qty") / col("cnt"))
    }),

    // a2: entity-metadata lookup (reference db1/db5 RocksDB gets) as a
    // broadcast hash join — dims ship to executors, fact never shuffles.
    "a2_join_broadcast" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .join(broadcast(Tables(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
             sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // a3: multiway join with filter/projection pushdown (the id↔title↔
    // entity chains the reference does via sequential KV stores).
    "a3_join_multiway" -> ((s, d) => {
      val region = Tables(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(s, d, "nation")
      val customer = Tables(s, d, "customer")
      val orders = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      customer
        .join(broadcast(nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))),
              col("c_nationkey") === col("n_nationkey"))
        .join(orders, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
             sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    }),

    // a4: allowlist filtering (parse_wiki_dump.py --allowed_values) as a
    // broadcast LEFT SEMI join — no payload columns move.
    "a4_semijoin_allowlist" -> ((s, d) => {
      val allowed = Tables(s, d, "part").filter(col("p_size") < 15).select("p_partkey")
      Tables(s, d, "lineitem")
        .join(broadcast(allowed), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
    }),

    // a5: unmapped-row accounting (`skipped` counter in
    // map_to_wikidata_ids_and_titles.py) as a LEFT ANTI join —
    // customers with no urgent order.
    "a5_antijoin_unmapped" -> ((s, d) => {
      val urgent = Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      Tables(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // a6: the reference's external-sort + streaming group-by
    // (reformat_csv_to_json.py) → one shuffle into sorted member lists;
    // canonical csv string so the hash is dialect-stable.
    "a6_group_collect" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(concat_ws(",", sort_array(collect_list(col("l_partkey")))).as("members"),
             count(lit(1)).as("cnt"))
    }),

    // a7: per-collection top-k (top10_names in prepare_collections2.py).
    "a7_window_topk" -> ((s, d) => {
      Relational.topKPerGroup(
        Tables(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq(col("l_orderkey")),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc), 3)
    }),

    // a8: ordered running aggregates per key (member orderings studied
    // in research/sort_members/sort.py) — decimal running sum for exact
    // cross-engine totals.
    "a8_window_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("run_sum", sum(dec(col("value"))).over(w).cast("double"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
    }),
  )

  val oracles: Map[String, String] = Map(
    "a1_agg_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_price,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))) AS double) AS sum_disc_price,
        |  count(*) AS cnt,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "a2_join_broadcast" ->
      """SELECT p_brand, count(*) AS cnt,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    "a3_join_multiway" ->
      """SELECT n_name, count(*) AS cnt,
        |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= timestamp '1996-01-01'
        |  AND o_orderdate < timestamp '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "a4_semijoin_allowlist" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 15)
        |GROUP BY 1""".stripMargin,

    "a5_antijoin_unmapped" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')""".stripMargin,

    "a6_group_collect" ->
      """SELECT l_orderkey,
        |  string_agg(l_partkey, ',' ORDER BY l_partkey) AS members,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin,

    "a7_window_topk" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin,

    "a8_window_running" ->
      """SELECT user_id, event_id, value,
        |  cast(sum(cast(value AS decimal(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY event_id) AS double) AS run_sum,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |FROM events""".stripMargin,
  )
}
