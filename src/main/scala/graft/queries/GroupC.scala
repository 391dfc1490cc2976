package graft.queries

import graft.Tables
import graft.sources.NTriples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group C — sources/formats: N-triples parsing (create_kv.py inlet),
  * subject-grouped first-wins predicate maps (predicates_one), and JSON
  * column extraction (update_elasticsearch.py nested fields).
  *
  * The testdata ships no raw triples file, so c1 synthesizes N-triples
  * LINES deterministically from `part` (same expression on both
  * engines) and then exercises the real parser on them — the thing
  * under test is the parse, not the generator.
  */
object GroupC {
  type Q = (SparkSession, String) => DataFrame

  // k % 3 == 0 → label literal with language tag; 1 → entity-valued
  // instance_of; 2 → plain numeric literal. Covers the reference's
  // three object shapes (create_kv.py clean()).
  private val genLineSql =
    """CASE
      |  WHEN p_partkey % 3 = 0 THEN
      |    '<http://ex/e/Q' || cast(p_partkey AS string) ||
      |    '> <http://ex/p/label> "' || p_name || '"@en .'
      |  WHEN p_partkey % 3 = 1 THEN
      |    '<http://ex/e/Q' || cast(p_partkey AS string) ||
      |    '> <http://ex/p/instance_of> <http://ex/e/Q' ||
      |    cast(p_partkey % 7 + 1 AS string) || '> .'
      |  ELSE
      |    '<http://ex/e/Q' || cast(p_partkey AS string) ||
      |    '> <http://ex/p/qrank> "' || cast(p_size AS string) || '" .'
      |END""".stripMargin.replace("\n", " ")

  val queries: Map[String, Q] = Map(
    // c1: N-triples lines → cleaned (subject, predicate, obj) rows.
    "c1_ntriples_parse" -> ((s, d) => {
      val lines = Tables(s, d, "part").select(expr(genLineSql).as("value"))
      NTriples.parse(lines).filter(col("subject") =!= "")
    }),

    // c2: subject-grouped single-valued predicate map, first-wins by
    // event order (create_kv.py predicates_one keeps the first triple
    // per predicate) — min_by under FILTER, one map-side-combinable agg.
    "c2_group_entity" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(
          expr("min_by(value, event_id) FILTER (WHERE event_type = 'click')").as("first_click"),
          expr("min_by(value, event_id) FILTER (WHERE event_type = 'view')").as("first_view"),
          expr("min_by(value, event_id) FILTER (WHERE event_type = 'purchase')").as("first_purchase"),
          count(lit(1)).as("n_events"))
    }),

    // c4: SQL-dump INSERT parsing (parse_wiki_dump.py) — lines are
    // synthesized deterministically from `supplier` (5 tuples per
    // INSERT, suppkey-ordered; same expression on both engines), then
    // the real tuple splitter + field extraction run on them.
    "c4_sqldump_parse" -> ((s, d) => {
      // The synthesized name carries PARENTHESES inside the quoted
      // value — "NAME (NK)" — so the hash gate proves the quote-aware
      // tuple scan keeps them in-tuple (the r12 review's corruption
      // class: real Wikipedia titles are full of parens).
      val tup = concat(lit("("), col("s_suppkey"), lit(",'"), col("s_name"),
        lit(" ("), col("s_nationkey"), lit(")',"), col("s_nationkey"), lit(")"))
      val lines = Tables(s, d, "supplier")
        .select(expr("s_suppkey DIV 5").as("g"),
          struct(col("s_suppkey"), tup.as("t")).as("st"))
        .groupBy("g")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(col("st"))), x => x.getField("t"))).as("body"))
        .select(concat(lit("INSERT INTO supplier VALUES "), col("body"), lit(";"))
          .as("value"))
      val fieldRe = "^(\\d+),'([^']*)',(\\d+)$"
      graft.sources.SqlDump.tuples(lines).select(
        regexp_extract(col("tuple"), fieldRe, 1).cast("long").as("suppkey"),
        regexp_extract(col("tuple"), fieldRe, 2).as("name"),
        regexp_extract(col("tuple"), fieldRe, 3).cast("long").as("nationkey"))
    }),

    // c5: CSV inlet parsing (the reference's third inlet format —
    // QRank and suggestable-domains CSVs, Makefile inlets) via the
    // native from_csv: schema-on-read with quoted fields (the name
    // carries an embedded comma) and PERMISSIVE malformed-row
    // handling — every 13th row ships a non-numeric balance, which
    // must null the field and surface the raw line in the corrupt
    // column, never kill the job. Lines are synthesized
    // deterministically from `customer` (same expression both
    // engines); the thing under test is the parse.
    "c5_csv_parse" -> ((s, d) => {
      val bal = col("c_acctbal").cast("decimal(12,2)").cast("string")
      val lines = Tables(s, d, "customer")
        .select(concat(
          col("c_custkey"), lit(",\""), col("c_name"), lit(", Ltd\","),
          col("c_mktsegment"), lit(","),
          when(col("c_custkey") % 13 === 0, lit("oops")).otherwise(bal))
          .as("value"))
      lines
        .select(col("value"), from_csv(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "custkey LONG, name STRING, seg STRING, bal DECIMAL(12,2), _corrupt STRING"),
          Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
        .select(col("r.custkey"), col("r.name"), col("r.seg"),
          col("r.bal").cast("double").as("bal"),
          col("r._corrupt").isNotNull.as("malformed"))
    }),

    // c3: JSON property extraction + aggregation over it.
    "c3_json_extract" -> ((s, d) => {
      Tables(s, d, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"),
             max(col("k")).as("k_max"),
             sum(when(col("k") > 50, 1L).otherwise(0L)).as("k_gt50"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "c1_ntriples_parse" ->
      s"""WITH lines AS (SELECT $genLineSql AS value FROM part),
         |parsed AS (
         |  SELECT
         |    regexp_extract(value, '^<([^>]+)> <([^>]+)> (.+) \\.$$', 1) AS s_uri,
         |    regexp_extract(value, '^<([^>]+)> <([^>]+)> (.+) \\.$$', 2) AS p_uri,
         |    regexp_extract(value, '^<([^>]+)> <([^>]+)> (.+) \\.$$', 3) AS o_raw
         |  FROM lines)
         |SELECT
         |  regexp_extract(s_uri, '([^/#]+)$$', 1) AS subject,
         |  regexp_extract(p_uri, '([^/#]+)$$', 1) AS predicate,
         |  CASE WHEN starts_with(o_raw, '<')
         |       THEN regexp_extract(regexp_extract(o_raw, '^<([^>]+)>$$', 1), '([^/#]+)$$', 1)
         |       ELSE regexp_extract(o_raw, '^"((?:[^"\\\\]|\\\\.)*)"', 1) END AS obj,
         |  starts_with(o_raw, '<') AS obj_is_uri
         |FROM parsed
         |WHERE regexp_extract(s_uri, '([^/#]+)$$', 1) <> ''""".stripMargin,

    "c4_sqldump_parse" ->
      """WITH lines AS (
        |  SELECT 'INSERT INTO supplier VALUES ' ||
        |    string_agg('(' || s_suppkey || ',''' || s_name || ' (' || s_nationkey || ')'',' || s_nationkey || ')',
        |               ',' ORDER BY s_suppkey) || ';' AS value
        |  FROM supplier GROUP BY s_suppkey // 5),
        |tu AS (SELECT unnest(regexp_extract_all(value,
        |         '\(((?:''(?:[^''\\]|\\.|'''')*''|[^()''])*)\)', 1)) AS t
        |       FROM lines)
        |SELECT
        |  cast(regexp_extract(t, '^(\d+),''([^'']*)'',(\d+)$', 1) AS bigint) AS suppkey,
        |  regexp_extract(t, '^(\d+),''([^'']*)'',(\d+)$', 2) AS name,
        |  cast(regexp_extract(t, '^(\d+),''([^'']*)'',(\d+)$', 3) AS bigint) AS nationkey
        |FROM tu""".stripMargin,

    "c2_group_entity" ->
      """SELECT user_id,
        |  min_by(value, event_id) FILTER (WHERE event_type = 'click') AS first_click,
        |  min_by(value, event_id) FILTER (WHERE event_type = 'view') AS first_view,
        |  min_by(value, event_id) FILTER (WHERE event_type = 'purchase') AS first_purchase,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "c5_csv_parse" ->
      """WITH lines AS (
        |  SELECT c_custkey || ',"' || c_name || ', Ltd",' || c_mktsegment || ',' ||
        |    CASE WHEN c_custkey % 13 = 0 THEN 'oops'
        |         ELSE cast(cast(c_acctbal AS decimal(12,2)) AS varchar) END AS value
        |  FROM customer),
        |p AS (
        |  SELECT value,
        |    regexp_extract(value, '^(\d+),"([^"]*)",([^,]*),(.*)$', 1) AS k,
        |    regexp_extract(value, '^(\d+),"([^"]*)",([^,]*),(.*)$', 2) AS name,
        |    regexp_extract(value, '^(\d+),"([^"]*)",([^,]*),(.*)$', 3) AS seg,
        |    regexp_extract(value, '^(\d+),"([^"]*)",([^,]*),(.*)$', 4) AS balraw
        |  FROM lines)
        |SELECT cast(k AS bigint) AS custkey, name, seg,
        |  cast(try_cast(balraw AS decimal(12,2)) AS double) AS bal,
        |  (try_cast(balraw AS decimal(12,2)) IS NULL) AS malformed
        |FROM p""".stripMargin,

    "c3_json_extract" ->
      """SELECT event_type,
        |  cast(sum(k) AS bigint) AS k_sum,
        |  max(k) AS k_max,
        |  cast(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS bigint) AS k_gt50
        |FROM (SELECT event_type,
        |        cast(json_extract_string(props, '$.k') AS bigint) AS k
        |      FROM events)
        |GROUP BY 1""".stripMargin,
  )
}
