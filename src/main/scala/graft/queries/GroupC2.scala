package graft.queries

import graft.Tables
import graft.operators.Collections
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group C (continued) — the custom-collections ingestion flow, the
  * one reference DAG with no engine analogue until round 5
  * (airflow/dags/load_custom_collections.py): externally-curated
  * collections arrive as JSONL, are shaped into the pipeline's
  * document form (label defaulting, curator sort commands, rank
  * defaults — prepare_custom_collection, :184-336), and become index
  * update operations (create for unknown ids, full update for known
  * ones — produce_custom_update_operations, :371-396).
  *
  * The testdata ships no custom-collections file, so the JSONL LINES
  * are synthesized deterministically from `customer` (same expression
  * on both engines — the c1/c4/c5 pattern); the things under test are
  * [[Collections.fromCustom]] and [[Collections.customUpdateOps]].
  * Every 13th line is malformed JSON (must surface as a
  * `malformed` row, never kill the job), every 11th collection has
  * only skippable labels, labels alternate which of
  * normalized/tokenized they carry (both defaulting directions), and
  * the curator commands cycle through all five sort orders plus
  * absent-rank defaults.
  */
object GroupC2 {
  type Q = (SparkSession, String) => DataFrame

  // One custom-collections JSONL line per customer — dialect-shared
  // SQL (Spark expr() and the DuckDB oracle evaluate the same string).
  private[queries] val genLineSql =
    """CASE WHEN c_custkey % 13 = 0 THEN '{"oops": ' || cast(c_custkey AS string)
      |ELSE '{"data":{"collection_id":"c' || cast(c_custkey AS string) ||
      |  '","collection_name":"' || c_name || '","labels":[' ||
      |  CASE WHEN c_custkey % 11 = 0 THEN '{"label":"plain"}'
      |  ELSE '{"normalized_label":"' || lower(c_mktsegment) ||
      |    CASE WHEN c_custkey % 9 = 0 THEN '🔥' ELSE '' END ||
      |    'a' || cast(c_custkey % 7 AS string) || '"}' ||
      |    CASE WHEN c_custkey % 2 = 0 THEN ',{"tokenized_label":["' || lower(c_mktsegment) || '","b' || cast(c_custkey % 5 AS string) || '"]}' ELSE '' END ||
      |    CASE WHEN c_custkey % 3 = 0 THEN ',{"label":"plain"}' ELSE '' END
      |  END ||
      |  ']},"commands":{' || substring(
      |    CASE WHEN c_custkey % 4 = 0 THEN ',"member_rank":' || cast(c_custkey % 100 + 1 AS string) ELSE '' END ||
      |    CASE WHEN c_custkey % 5 = 0 THEN ',"collection_rank":' || cast(c_custkey % 1000 + 1 AS string) ELSE '' END ||
      |    CASE WHEN c_custkey % 12 IN (0, 1) THEN ',"sort_labels":"a-z"'
      |         WHEN c_custkey % 12 IN (2, 3) THEN ',"sort_labels":"z-a"'
      |         WHEN c_custkey % 12 IN (4, 5) THEN ',"sort_labels":"shortest"'
      |         WHEN c_custkey % 12 IN (6, 7) THEN ',"sort_labels":"longest"'
      |         WHEN c_custkey % 12 IN (8, 9) THEN ',"sort_labels":"none"'
      |         ELSE '' END, 2) || '}}'
      |END""".stripMargin

  // Shared with GroupP's p3 pipeline — single definitions,
  // parameterized on the customer frame so ScaleProbe measures the
  // exact registered bodies; the standalone queries and the composed
  // flow can't drift.
  private[graft] def linesOf(customer: DataFrame): DataFrame =
    customer.select(expr(genLineSql).as("value"))
  private[queries] def lines(s: SparkSession, d: String): DataFrame =
    linesOf(Tables(s, d, "customer"))

  /** The c7 cached-status dim: domains covering names ending a0..a3. */
  private[graft] def domainsDimOf(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 7 < 4)
      .select(
        concat(lower(col("c_mktsegment")), lit("a"),
          (col("c_custkey") % 7).cast("string")).as("name"),
        element_at(
          array(lit("available"), lit("taken"), lit("on_sale"),
            lit("recently_released")),
          (col("c_custkey") % 7 + 1).cast("int")).as("status"))
      .distinct()
  private[queries] def domainsDim(s: SparkSession, d: String): DataFrame =
    domainsDimOf(Tables(s, d, "customer"))

  /** The a33 existing-index stand-in: every third id already indexed. */
  private[graft] def existingIndexOf(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 3 === 0)
      .select(concat(lit("c"), col("c_custkey")).as("collection_id"),
        concat(lit("es-"), col("c_custkey")).as("es_id"))
  private[queries] def existingIndex(s: SparkSession, d: String): DataFrame =
    existingIndexOf(Tables(s, d, "customer"))

  val queries: Map[String, Q] = Map(
    // c6: JSONL inlet → one typed row per custom collection.
    "c6_custom_jsonl" -> ((s, d) => Collections.fromCustom(lines(s, d))),

    // c7: per-collection domain-status histogram — the member-grain
    // half of prepare_custom_collection (cached_status lookup +
    // status_counts + the reference's nonavailable +1 / MIN_VALUE
    // quirks). The domains dim covers only names ending a0..a3 (so
    // never_registered is exercised by a4..a6, the tokenized-label
    // members and the emoji names); status is a function of the name
    // digit, identical on both engines.
    "c7_custom_status" -> ((s, d) =>
      Collections.customStatusCounts(
        Collections.customMembers(lines(s, d)), domainsDim(s, d))),

    // a33: shaped custom collections → index update operations.
    // "Existing index" stand-in: every third customer id is already
    // indexed under es_id 'es-<k>'. maxMembers = 1 exercises the
    // reference's members-count drop rule on real rows (2-member
    // collections are dropped; the reference threshold is 10k).
    "a33_custom_update_ops" -> ((s, d) =>
      Collections.customUpdateOps(
        Collections.fromCustom(lines(s, d)), existingIndex(s, d),
        maxMembers = 1L)),
  )

  // Shared oracle CTE prefix (lines → good/bad → labels → shaped
  // members + line metadata), used by the c6, c7 and a33 oracles.
  // DuckDB-side JSON: labels unnest via json_extract '$[*]' zipped
  // with range() for the input-order ordinal; malformed lines route
  // through a separate branch (json functions error on invalid JSON,
  // so `bad` never reaches them).
  private val memCtes =
    s"""lines AS (SELECT $genLineSql AS value FROM customer),
       |good AS (SELECT value FROM lines WHERE json_valid(value)),
       |bad AS (SELECT value FROM lines WHERE NOT json_valid(value)),
       |lab AS (
       |  SELECT value,
       |    unnest(json_extract(value, '$$.data.labels[*]')) AS l,
       |    unnest(range(1, cast(json_array_length(value, '$$.data.labels') AS BIGINT) + 1)) AS ord
       |  FROM good),
       |mem AS (
       |  SELECT value, ord,
       |    coalesce(json_extract_string(l, '$$.normalized_label'),
       |             list_aggregate(json_transform(json_extract(l, '$$.tokenized_label'), '["VARCHAR"]'),
       |                            'string_agg', '')) AS norm,
       |    cast(coalesce(json_array_length(json_extract(l, '$$.tokenized_label')),
       |           len(regexp_extract_all(json_extract_string(l, '$$.normalized_label'),
       |                                  '${graft.functions.Text.emojiTokenRe.replace("'", "''")}')))
       |         AS BIGINT) AS ntok
       |  FROM lab
       |  WHERE json_extract(l, '$$.normalized_label') IS NOT NULL
       |     OR json_extract(l, '$$.tokenized_label') IS NOT NULL)""".stripMargin

  private[queries] val customOracle =
    s"""WITH $memCtes,
       |agg AS (
       |  SELECT value,
       |    count(*) AS n_members,
       |    string_agg(norm, ',' ORDER BY norm) AS members,
       |    cast(sum(ntok) AS BIGINT) AS n_tokens_total,
       |    min(norm) AS m_az,
       |    max(norm) AS m_za,
       |    min_by(norm, lpad(cast(ntok AS string), 10, '0') || norm) AS m_short,
       |    min_by(norm, lpad(cast(1000000000 - ntok AS string), 10, '0') || norm) AS m_long,
       |    min_by(norm, ord) AS m_first
       |  FROM mem GROUP BY value),
       |meta AS (
       |  SELECT value,
       |    json_extract_string(value, '$$.data.collection_id') AS collection_id,
       |    json_extract_string(value, '$$.data.collection_name') AS collection_name,
       |    cast(json_array_length(value, '$$.data.labels') AS BIGINT) AS n_labels,
       |    coalesce(try_cast(json_extract(value, '$$.commands.member_rank') AS BIGINT), 10000000) AS member_rank,
       |    coalesce(try_cast(json_extract(value, '$$.commands.collection_rank') AS BIGINT), 1000000) AS rank,
       |    coalesce(json_extract_string(value, '$$.commands.sort_labels'), 'none') AS cmd
       |  FROM good)
       |SELECT m.collection_id, m.collection_name,
       |  coalesce(a.n_members, 0) AS n_members,
       |  m.n_labels - coalesce(a.n_members, 0) AS n_skipped,
       |  coalesce(a.members, '') AS members,
       |  CASE WHEN a.n_members IS NULL THEN NULL
       |       WHEN m.cmd = 'a-z' THEN a.m_az
       |       WHEN m.cmd = 'z-a' THEN a.m_za
       |       WHEN m.cmd = 'shortest' THEN a.m_short
       |       WHEN m.cmd = 'longest' THEN a.m_long
       |       ELSE a.m_first END AS top_member,
       |  coalesce(a.n_tokens_total, 0) AS n_tokens_total,
       |  m.member_rank, m.rank, false AS malformed
       |FROM meta m LEFT JOIN agg a USING (value)
       |UNION ALL
       |SELECT NULL, NULL, 0, 0, '', NULL, 0, 10000000, 1000000, true FROM bad""".stripMargin

  // The a33/p3 existing-index CTE — one definition.
  private[queries] val existingCte =
    """ex AS (SELECT 'c' || cast(c_custkey AS string) AS collection_id,
      |              'es-' || cast(c_custkey AS string) AS es_id
      |       FROM customer WHERE c_custkey % 3 = 0)""".stripMargin

  // The c7 oracle — also embedded whole as a CTE by the p3 oracle.
  private[queries] val statusOracle =
    s"""WITH $memCtes,
         |meta AS (SELECT value,
         |           json_extract_string(value, '$$.data.collection_id') AS collection_id
         |         FROM good),
         |members AS (SELECT meta.collection_id, mem.norm AS member
         |            FROM mem JOIN meta USING (value)),
         |domains AS (
         |  SELECT DISTINCT lower(c_mktsegment) || 'a' || cast(c_custkey % 7 AS string) AS name,
         |    CASE c_custkey % 7 WHEN 0 THEN 'available' WHEN 1 THEN 'taken'
         |         WHEN 2 THEN 'on_sale' ELSE 'recently_released' END AS status
         |  FROM customer WHERE c_custkey % 7 < 4),
         |j AS (SELECT collection_id, coalesce(d.status, 'never_registered') AS st
         |      FROM members LEFT JOIN domains d ON members.member = d.name)
         |SELECT collection_id,
         |  count(*) AS n_members,
         |  cast(sum(CASE WHEN st = 'available' THEN 1 ELSE 0 END) AS bigint) AS available,
         |  cast(sum(CASE WHEN st = 'taken' THEN 1 ELSE 0 END) AS bigint) AS taken,
         |  cast(sum(CASE WHEN st = 'on_sale' THEN 1 ELSE 0 END) AS bigint) AS on_sale,
         |  cast(sum(CASE WHEN st = 'recently_released' THEN 1 ELSE 0 END) AS bigint) AS recently_released,
         |  cast(sum(CASE WHEN st = 'never_registered' THEN 1 ELSE 0 END) AS bigint) AS never_registered,
         |  cast(sum(CASE WHEN st IN ('taken', 'on_sale', 'recently_released') THEN 1 ELSE 0 END) + 1 AS bigint)
         |    AS nonavailable_count,
         |  greatest(
         |    sum(CASE WHEN st IN ('taken', 'on_sale', 'recently_released') THEN 1 ELSE 0 END) * 1.0
         |      / count(*), 1e-8) AS nonavailable_ratio
         |FROM j GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "c6_custom_jsonl" -> customOracle,

    "c7_custom_status" -> statusOracle,

    "a33_custom_update_ops" ->
      s"""WITH c6 AS ($customOracle),
         |$existingCte
         |SELECT c6.collection_id,
         |  CASE WHEN ex.es_id IS NOT NULL THEN 'update' ELSE 'create' END AS op,
         |  coalesce(ex.es_id, 'new-' || c6.collection_id) AS es_id,
         |  c6.n_members, c6.rank
         |FROM c6 LEFT JOIN ex USING (collection_id)
         |WHERE NOT c6.malformed AND c6.n_members <= 1""".stripMargin,
  )
}
