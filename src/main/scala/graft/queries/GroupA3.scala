package graft.queries

import graft.operators.Checkpoints.Cuttable
import graft.Tables
import graft.operators.{Relational, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group A (continued) — round-2 relational additions: as-of join and
  * diversity-capped top-k, the two ranking/alignment shapes the
  * reference needs beyond plain windows (related-collections caps
  * results per type; event alignment is the standard enrichment join
  * for time-keyed training data).
  */
object GroupA3 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // a21: as-of join — each purchase event picks up the user's latest
    // click at-or-before it. One shuffle on user_id (union + running
    // window), no range join.
    "a21_asof_join" -> ((s, d) => {
      val e = Tables(s, d, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("es"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("es"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("es").as("click_es"))
        .agg(max(col("event_id")).as("click_id"))
        .select("user_id", "click_es", "click_id")
      Relational.asofJoin(purchases, clicks, "user_id", "es", "click_es",
          rightTiebreak = Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("es"),
          col("asof.click_id").as("click_id"),
          col("asof.click_es").as("click_es"))
    }),

    // a22: diversity-capped top-k — a customer's 5 largest orders, at
    // most 2 per order status (precompute_related.py's per-type cap).
    "a22_diverse_topk" -> ((s, d) =>
      Relational.diverseTopK(
        Tables(s, d, "orders")
          .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"),
        Seq(col("o_custkey")), col("o_orderstatus"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 5, perKind = 2)),

    // a25: related collections by member overlap
    // (precompute_related.py): collections (orders) sharing members
    // (parts) pair through the member inverted index
    // (Relational.overlapPairs — bounded buckets, no all-pairs), then
    // EVERY collection ranks ALL its partners (both directions of
    // each undirected pair) and keeps its top-5. Pair mass is the
    // unavoidable exchange; everything optional stays AFTER the rank
    // cut: "related" requires overlap ≥ 2 (one incidental shared
    // member is noise), ranking ties break on the partner id alone so
    // the size join + jaccard attach to at most k rows per
    // collection, not to every candidate pair.
    //
    // Result contract: overlap is counted over members appearing in
    // ≤ 40 collections (overlapPairs dfCap) — the skew bound that
    // keeps one ubiquitous member from creating a quadratic join
    // bucket at scale. Collection sizes (jaccard denominator) stay
    // uncapped. The pair set is checkpointed BEFORE the two-direction
    // union: it is k-rows tiny by then, and the union's branches
    // would otherwise each recompute the whole pair join (Catalyst
    // does not dedupe common subplans).
    "a25_related_collections" -> ((s, d) => {
      val mem = Tables(s, d, "lineitem")
        .select(col("l_orderkey").as("coll"), col("l_partkey").as("member"))
        .distinct().cut()
      val sizes = mem.groupBy("coll").agg(count(lit(1)).as("n"))
      // boundedDf: dfCap=40 caps every surviving member's id list, so
      // the collect-and-emit path is safe (per-element buffer ≤ 40
      // ids) and strictly cheaper than the inverted-index self-join —
      // pairs are born ordered (id_a < id_b), halving intermediate
      // rows, and the join's probe-side exchange disappears. The r14
      // verdict's a25 diet ask: same pair set, same overlap counts,
      // hash unchanged — only the plan shape slims.
      val undirected = Relational.overlapPairs(mem, "coll", "member",
          dfCap = 40L, boundedDf = true)
        .filter(col("overlap") >= 2)
        .cut()
      val directed = undirected
        .select(col("id_a").as("coll"), col("id_b").as("related"), col("overlap"))
        .union(undirected
          .select(col("id_b").as("coll"), col("id_a").as("related"), col("overlap")))
      Relational.topKPerGroup(directed, Seq(col("coll")),
          Seq(col("overlap").desc, col("related").asc), k = 5, rankCol = "rank")
        .join(sizes.select(col("coll"), col("n").as("na")), "coll")
        .join(sizes.select(col("coll").as("related"), col("n").as("nb")), "related")
        .select(col("coll"), col("related"), col("overlap"),
          round(col("overlap").cast("double") /
            (col("na") + col("nb") - col("overlap")), 6).as("jaccard"),
          col("rank"))
    }),

    // a23: ENS namehash — the reference stamps members with
    // namehash(curated + ".eth") (prepare_collections2.py:116). Native
    // keccak expression; DuckDB has no keccak, so the machine oracle
    // is two keccak-free reductions of the same computation:
    //   1. The committed expected-vectors parquet (tools/
    //      gen_namehash_vectors.py — an INDEPENDENT pure-Python keccak,
    //      self-checked against the published EIP-137 / Ethereum
    //      vectors): Spark computes namehash(name) per vector row and
    //      the oracle reads the expected hex from the same file.
    //   2. A corpus injectivity invariant: Spark counts DISTINCT
    //      hashes over every curated part name at the given SF; the
    //      oracle counts DISTINCT names. Any collision or instability
    //      introduced by the engine's keccak breaks the hash compare.
    // Together these replace the former rows-only "no_oracle" cell
    // with a full rows+schema+hash gate while still reading the
    // corpus. KeccakSpec additionally pins the spec vectors in CI.
    "a23_namehash" -> ((s, d) => {
      val vectors = s.read.parquet(graft.functions.Hashes.vectorsPathChecked)
        .select(col("name"))
      val hashed = vectors.select(
        col("name"),
        hex(graft.functions.Hashes.namehash(col("name"))).as("namehash"))
      val corpus = Tables(s, d, "part").select(
        hex(graft.functions.Hashes.namehash(
          concat(regexp_replace(lower(col("p_name")), "[^a-z0-9]+", "-"),
            lit(".eth")))).as("h"))
      val invariant = corpus
        .agg(count_distinct(col("h")).cast("string").as("namehash"))
        .select(lit("__corpus_distinct_hashes__").as("name"),
          col("namehash"))
      hashed.union(invariant)
    }),
  )

  val oracles: Map[String, String] = Map(
    "a21_asof_join" ->
      """WITH e AS (SELECT event_id, user_id,
        |             cast(floor(epoch(ts)) AS bigint) AS es, event_type
        |           FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, es
        |      FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, es AS click_es, max(event_id) AS click_id
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, p.es, c.click_id, c.click_es
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.es >= c.click_es""".stripMargin,

    "a25_related_collections" ->
      """WITH mem AS (SELECT DISTINCT l_orderkey AS coll, l_partkey AS member
        |             FROM lineitem),
        |sizes AS (SELECT coll, count(*) AS n FROM mem GROUP BY 1),
        |keep AS (SELECT member FROM mem GROUP BY 1 HAVING count(*) <= 40),
        |capped AS (SELECT mem.* FROM mem JOIN keep USING (member)),
        |und AS (
        |  SELECT a.coll AS coll_a, b.coll AS coll_b, count(*) AS overlap
        |  FROM capped a JOIN capped b USING (member)
        |  WHERE a.coll < b.coll GROUP BY 1, 2
        |  HAVING count(*) >= 2),
        |dir AS (
        |  SELECT coll_a AS coll, coll_b AS related, overlap FROM und
        |  UNION ALL
        |  SELECT coll_b AS coll, coll_a AS related, overlap FROM und),
        |ranked AS (
        |  SELECT coll, related, overlap, cast(rank AS int) AS rank
        |  FROM (SELECT *, row_number() OVER (PARTITION BY coll
        |          ORDER BY overlap DESC, related ASC) AS rank
        |        FROM dir)
        |  WHERE rank <= 5)
        |SELECT ranked.coll AS coll, ranked.related AS related, overlap,
        |  round(overlap * 1.0 / (sa.n + sb.n - overlap), 6) AS jaccard, rank
        |FROM ranked
        |JOIN sizes sa ON sa.coll = ranked.coll
        |JOIN sizes sb ON sb.coll = ranked.related""".stripMargin,

    "a22_diverse_topk" ->
      """WITH r1 AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderstatus
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM r1 WHERE rk <= 2)
        |SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice
        |FROM r2 WHERE rn <= 5""".stripMargin,

    // a23: DuckDB cannot compute keccak, but it can (1) read the
    // committed expected-vectors parquet — generated by an independent
    // implementation — and (2) replay the corpus injectivity invariant
    // without hashing: distinct curated NAMES must equal Spark's
    // distinct HASHES, or keccak collided/miscomputed.
    "a23_namehash" ->
      s"""SELECT name, namehash
         |FROM read_parquet('${graft.functions.Hashes.vectorsPath}')
         |UNION ALL
         |SELECT '__corpus_distinct_hashes__' AS name,
         |  cast(count(DISTINCT
         |    concat(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
         |           '.eth')) AS varchar) AS namehash
         |FROM part""".stripMargin,
  )
}
