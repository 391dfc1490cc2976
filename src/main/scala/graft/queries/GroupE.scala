package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Group E — similarity search over `embeddings`: exact brute-force
  * kNN as the correctness baseline, hyperplane-LSH ANN as the scale
  * path — ALL DuckDB-oracled since round 6: e2's buckets replay
  * bit-for-bit, and e3/e6's k-means fits unroll their fixed Lloyd
  * iterations into CTEs (9-dp mean rounding bridges the one
  * order-dependent reduction, per the operator contract). Recall
  * floors vs e1 are additionally asserted in SimilarityLshSpec.
  * Every 50th vector plays the query set.
  */
object GroupE {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")
  private def queriesSet(s: SparkSession, d: String) =
    emb(s, d).filter(col("vec_id") % 50 === 0)

  val queries: Map[String, Q] = Map(
    "e1_knn_bruteforce" -> ((s, d) =>
      Similarity.knnBruteForce(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10)),

    // dim passed explicitly (a dataset constant): the registered plan
    // runs with ZERO driver probe jobs.
    "e2_knn_lsh" -> ((s, d) =>
      Similarity.knnLsh(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10, dim = 64)),

    "e3_knn_ivf" -> ((s, d) =>
      Similarity.knnIvf(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10)),

    // e4: int8 scalar quantization — the 4× embedding-storage cut
    // before ANN serving. Exact-oracled: fixed-order IEEE double
    // arithmetic + floor reproduces q bit-identically in DuckDB. The
    // quantized array is emitted as a canonical csv string (the
    // driver's hash compare needs a dialect-stable form); mn/mx round
    // to 6 for display only.
    "e4_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(emb(s, d), "vec_id", "embedding")
        .select(col("id").as("vec_id"),
          org.apache.spark.sql.functions.round(col("mn"), 6).as("mn"),
          org.apache.spark.sql.functions.round(col("mx"), 6).as("mx"),
          org.apache.spark.sql.functions.concat_ws(",", col("q")).as("q_csv"))),

    // e6: IVF+PQ search (FAISS IVFADC layout) — fully oracled (the
    // fit CTEs unroll both Lloyd loops); the recall floor vs e1 and
    // the loses-nothing-vs-plain-IVF property are additionally
    // pinned in RelationalExtSpec. The inverted lists carry PQ
    // codes instead of vectors, so the candidate join ships ~32×
    // less data — the 10⁹-vector serving shape.
    "e6_knn_ivfpq" -> ((s, d) =>
      Similarity.knnIvfPq(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10, dim = 64)),

    // e5: product quantization — 4 subspace codebooks of 16 sampled
    // codewords over the 64-dim embeddings: 4 small ints instead of
    // 64 floats per vector (the IVF+PQ serving layout). The SAMPLED
    // codebook (k lowest-id vectors) is what makes the codes exactly
    // reproducible in DuckDB; Lloyd refinement is the quality path
    // (pinned by spec: never increases reconstruction error). Codes
    // argmin on 6-dp-rounded distances with codeword-id tiebreak, so
    // both engines pick identical codes.
    "e5_quantize_pq" -> ((s, d) => {
      val e = emb(s, d)
      val cb = Similarity.pqCodebook(e, "vec_id", "embedding", m = 4, k = 16,
        dim = 64)
      Similarity.quantizePq(e, "vec_id", "embedding", cb, m = 4, dim = 64)
        .select(col("id").as("vec_id"),
          org.apache.spark.sql.functions.concat_ws(",", col("codes")).as("codes"))
    }),

    // e7: signed random projection of the int8-quantized embeddings —
    // the reproducible cosine sketch (16 signed integer sums per
    // vector). Quantize-then-project keeps every value integral, so
    // the DuckDB oracle matches bit-for-bit with no float rounding
    // anywhere. Narrow plan: literal sign arrays + fused ArrayDot
    // loops, zero shuffles before the final compare.
    "e7_random_projection" -> ((s, d) =>
      Similarity.randomSignProjection(emb(s, d), "vec_id", "embedding",
          k = 16, dim = 64)
        .select(col("id").as("vec_id"), col("j"), col("proj"))),

    // e8: kNN label propagation — the embedding-classifier step
    // (spread quality/topic labels from a labeled seed set by nearest
    // neighbors). classifyKnn composes over ANY of the kNN operators;
    // the registered query runs it on the exact e1 baseline, the
    // recall-spec'd ANN paths serve the same contract at scale
    // (composability pinned in SimilaritySpec).
    "e8_knn_classify" -> ((s, d) =>
      Similarity.classifyKnn(
        Similarity.knnBruteForce(queriesSet(s, d), emb(s, d),
          "vec_id", "embedding", k = 10),
        emb(s, d), "vec_id", "label")),

    // e9: recall@k acceptance gate — per-query recall of the LSH ANN
    // path (e2) against the exact baseline (e1). The first-class
    // query form of the recall floors SimilarityLshSpec asserts;
    // composes over any (exact, candidate) pair of kNN outputs.
    "e9_recall_eval" -> ((s, d) => {
      // The ANN and exact legs are independent constructions whose
      // building runs eager jobs (knnLsh's unit/bucket cuts; the
      // brute-force guard counts) — overlap them from two driver
      // threads (r17, guide §2.6; the d15 pattern), so the exact
      // leg's all-pairs stage back-fills the LSH leg's sequential
      // small cut stages.
      val (ann, exact) = graft.operators.Par.both(
        Similarity.knnLsh(queriesSet(s, d), emb(s, d),
          "vec_id", "embedding", k = 10, dim = 64),
        Similarity.knnBruteForce(queriesSet(s, d), emb(s, d),
          "vec_id", "embedding", k = 10))
      Similarity.recallAt(ann, exact)
    }),

    // e13: NDCG@k of the LSH retrieval against the exact ranking —
    // e9's graded sibling (compare_window_sizes.py:191-211): recall
    // counts membership, NDCG scores the ORDER, each hit graded by
    // its exact cosine and discounted by log2(rank+1). Ideal grades
    // floor at 0.0 (the reference's 2.0 suits 0–4 human annotations;
    // cosine grades live in [-1, 1]).
    "e13_ndcg_eval" -> ((s, d) => {
      // Same two independent legs as e9 — same driver-thread overlap.
      val (ann, exact) = graft.operators.Par.both(
        Similarity.knnLsh(queriesSet(s, d), emb(s, d),
          "vec_id", "embedding", k = 10, dim = 64),
        Similarity.knnBruteForce(queriesSet(s, d), emb(s, d),
          "vec_id", "embedding", k = 10))
      Similarity.ndcgAt(ann, exact)
    }),

    // e11: incremental ANN index maintenance — the vector-side
    // analogue of d11's incremental dedup. The serving structures
    // (IVF centroids + PQ codebook, e6's exact fit recipe) are built
    // on the EXISTING corpus (ids % 10 != 0); the DAILY slice (every
    // 10th id) then assigns against them with NO refit: nearest
    // coarse cell + PQ codes per new vector — the inverted-list delta
    // rows a serving index unions in per ingest cycle. Fully oracled:
    // the fit replays e6's unrolled Lloyd/PQ CTEs on the old corpus,
    // the assignment the same argmax/argmin tie-break contracts.
    "e11_ann_incremental" -> ((s, d) => {
      val e = emb(s, d)
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val slice = e.filter(col("vec_id") % 10 === 0)
      val (cent, cb) = Similarity.ivfPqFit(old, "vec_id", "embedding",
        dim = 64)
      Similarity.ivfPqIndexDelta(slice, "vec_id", "embedding", cent, cb,
          m = 8, dim = 64)
        .select(col("id").as("vec_id"), col("cid"),
          org.apache.spark.sql.functions.concat_ws(",", col("codes")).as("codes"))
    }),

    // e12: e11's SERVING form — the vector family's p5/d19: the IVF
    // centroids and PQ codebook reload from the ModelStore serving
    // store (fitted once per corpus fingerprint, broadcast-eligible
    // with the (m, ds) geometry stamp intact and ENFORCED on the
    // reloaded frame), so the registered cost is the per-cycle
    // assignment + encoding alone. Same oracle as e11: values must be
    // identical to the inline fit.
    "e12_ann_serving" -> ((s, d) => {
      val root = GroupP.ensureServingModels(s, d)
      Similarity.ivfPqIndexDelta(
          emb(s, d).filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          graft.sinks.ModelStore.load(s, s"$root/centroids"),
          graft.sinks.ModelStore.load(s, s"$root/codebook"),
          m = 8, dim = 64)
        .select(col("id").as("vec_id"), col("cid"),
          org.apache.spark.sql.functions.concat_ws(",", col("codes")).as("codes"))
    }),

    // e10: radius retrieval — every corpus vector within cosine ≥ 0.35
    // of each query (the thresholded contract next to e2's top-k:
    // dedup candidate lookup / "all matches above the bar"). Same LSH
    // candidates + exact rescore, so the oracle replays e2's proven
    // bucket path with a threshold instead of a rank.
    "e10_range_search" -> ((s, d) =>
      Similarity.rangeSearchLsh(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", tau = 0.35, dim = 64)),
  )

  /** One unrolled Lloyd iteration for the e3 oracle: assign every
    * unit vector (CTE `uu`) to its nearest `prev` centroid (argmax of
    * the ascending-fold dot, cid-ascending tiebreak — exactly
    * Similarity.ivfAssign), then the 9-dp-rounded spherical mean,
    * renormalized. Produces CTE `out`. */
  private[queries] def lloydIter(prev: String, out: String): String =
    s"""p$out AS (SELECT id, cid, un FROM (
       |  SELECT q.*, row_number() OVER (PARTITION BY id
       |                 ORDER BY dot DESC, cid ASC) AS rn
       |  FROM (SELECT u2.id, c.cid, u2.un,
       |          list_reduce(list_transform(generate_series(1, 64),
       |            i -> u2.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
       |        FROM uu u2, $prev c) q) WHERE rn = 1),
       |m$out AS (SELECT cid, pos, round(avg(v), 9) AS m FROM (
       |    SELECT cid, unnest(un) AS v,
       |           unnest(generate_series(0, 63)) AS pos
       |    FROM p$out) GROUP BY 1, 2),
       |v$out AS (SELECT cid, array_agg(m ORDER BY pos) AS mean
       |          FROM m$out GROUP BY 1),
       |$out AS (SELECT cid, CASE WHEN nn = 0 THEN mean
       |           ELSE list_transform(mean, x -> x / nn) END AS cvec
       |         FROM (SELECT cid, mean,
       |                 sqrt(list_reduce(list_transform(mean, x -> x * x),
       |                      (x, y) -> x + y)) AS nn FROM v$out))""".stripMargin

  /** One unrolled PQ-Lloyd iteration for the e6 oracle (subspace
    * codebooks over CTE `subs` = (id, s, sub)): assign each subvector
    * to its nearest `prev` codeword — argmin of the 6-dp-rounded
    * squared distance with cid-ascending tiebreak, exactly
    * Similarity.assignPq, association (a + b) - (2 * c) preserved —
    * then the 9-dp-rounded per-(s, cid, pos) mean. Produces CTE
    * `out` = (s, cid, cvec). */
  private[queries] def pqIter(prev: String, out: String): String =
    s"""g$out AS (SELECT id, s, cid FROM (
       |  SELECT q.*, row_number() OVER (PARTITION BY id, s
       |                 ORDER BY d2r ASC, cid ASC) AS rn
       |  FROM (SELECT sb.id, sb.s, c.cid,
       |          round(list_reduce(list_transform(generate_series(1, 8),
       |                  i -> sb.sub[i] * sb.sub[i]), (x, y) -> x + y)
       |            + list_reduce(list_transform(generate_series(1, 8),
       |                  i -> c.cvec[i] * c.cvec[i]), (x, y) -> x + y)
       |            - 2 * list_reduce(list_transform(generate_series(1, 8),
       |                  i -> c.cvec[i] * sb.sub[i]), (x, y) -> x + y), 6) AS d2r
       |        FROM subs sb JOIN $prev c USING (s)) q) WHERE rn = 1),
       |q$out AS (SELECT s, cid, pos, round(avg(x), 9) AS mv FROM (
       |    SELECT a.s, a.cid, unnest(sb.sub) AS x,
       |           unnest(generate_series(0, 7)) AS pos
       |    FROM g$out a JOIN subs sb ON sb.id = a.id AND sb.s = a.s)
       |  GROUP BY 1, 2, 3),
       |$out AS (SELECT s, cid, array_agg(mv ORDER BY pos) AS cvec
       |         FROM q$out GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    // e6 replays the FULL IVFADC serving path: the e3 IVF fit (same
    // unrolled Lloyd CTEs), 8-subspace PQ codebooks with two unrolled
    // refinement iterations, code assignment, the per-query ADC
    // lookup table, the rounded ADC shortlist (top-100) and the exact
    // rescore. The two order-dependent reductions (Lloyd means, the
    // 8-term ADC sum) are bridged by the operator's own 9-dp/6-dp
    // rounding contract; every other float op is the same ascending
    // fold as the codegen loops.
    "e6_knn_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
         |nr AS (SELECT vec_id, vd,
         |         sqrt(list_reduce(list_transform(vd, x -> x * x),
         |              (a, b) -> a + b)) AS nrm FROM e),
         |uu AS (SELECT vec_id AS id,
         |         CASE WHEN nrm = 0 THEN vd
         |              ELSE list_transform(vd, x -> x / nrm) END AS un FROM nr),
         |c0 AS (SELECT id AS cid, un AS cvec FROM uu WHERE id % 37 = 0),
         |${lloydIter("c0", "c1")},
         |${lloydIter("c1", "c2")},
         |sp AS (SELECT unnest(generate_series(0, 7)) AS s),
         |subs AS (SELECT id, s, un[s * 8 + 1 : s * 8 + 8] AS sub FROM uu, sp),
         |sd AS (SELECT id, un FROM uu ORDER BY id LIMIT 16),
         |cb0 AS (SELECT s, id AS cid, un[s * 8 + 1 : s * 8 + 8] AS cvec
         |        FROM sd, sp),
         |${pqIter("cb0", "cb1")},
         |${pqIter("cb1", "cb2")},
         |codes AS (SELECT id, s, cid AS code FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id, s
         |                 ORDER BY d2r ASC, cid ASC) AS rn
         |  FROM (SELECT sb.id, sb.s, c.cid,
         |          round(list_reduce(list_transform(generate_series(1, 8),
         |                  i -> sb.sub[i] * sb.sub[i]), (x, y) -> x + y)
         |            + list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * c.cvec[i]), (x, y) -> x + y)
         |            - 2 * list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * sb.sub[i]), (x, y) -> x + y), 6) AS d2r
         |        FROM subs sb JOIN cb2 c USING (s)) q) WHERE rn = 1),
         |lv AS (SELECT id AS neighbor_id, cid FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id
         |                 ORDER BY dot DESC, cid ASC) AS rn
         |  FROM (SELECT u3.id, c.cid,
         |          list_reduce(list_transform(generate_series(1, 64),
         |            i -> u3.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
         |        FROM uu u3, c2 c) q) WHERE rn = 1),
         |qp AS (SELECT id AS query_id, cid FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id
         |                 ORDER BY dot DESC, cid ASC) AS rn
         |  FROM (SELECT u4.id, c.cid,
         |          list_reduce(list_transform(generate_series(1, 64),
         |            i -> u4.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
         |        FROM (SELECT * FROM uu WHERE id % 50 = 0) u4, c2 c) q)
         |  WHERE rn <= 4),
         |qsub AS (SELECT id AS query_id, s, un[s * 8 + 1 : s * 8 + 8] AS qs
         |         FROM (SELECT * FROM uu WHERE id % 50 = 0), sp),
         |lut AS (SELECT q.query_id, q.s, c.cid AS code,
         |          round(list_reduce(list_transform(generate_series(1, 8),
         |                  i -> q.qs[i] * q.qs[i]), (x, y) -> x + y)
         |            + list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * c.cvec[i]), (x, y) -> x + y)
         |            - 2 * list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * q.qs[i]), (x, y) -> x + y), 9) AS d2
         |        FROM qsub q JOIN cb2 c USING (s)),
         |adc AS (SELECT p.query_id, l.neighbor_id,
         |          round(sum(t.d2), 6) AS adist
         |        FROM qp p
         |        JOIN lv l ON l.cid = p.cid AND l.neighbor_id <> p.query_id
         |        JOIN codes cd ON cd.id = l.neighbor_id
         |        JOIN lut t ON t.query_id = p.query_id AND t.s = cd.s
         |                  AND t.code = cd.code
         |        GROUP BY 1, 2),
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adist ASC, neighbor_id ASC) AS sr
         |  FROM adc) WHERE sr <= 100),
         |resc AS (SELECT s.query_id, s.neighbor_id,
         |           round(list_reduce(list_transform(generate_series(1, 64),
         |             i -> a.un[i] * b.un[i]), (x, y) -> x + y), 4) AS cosine
         |         FROM short s
         |         JOIN uu a ON a.id = s.query_id
         |         JOIN uu b ON b.id = s.neighbor_id)
         |SELECT query_id, neighbor_id, cosine, cast(rank AS int) AS rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM resc)
         |WHERE rank <= 10""".stripMargin,

    // e3 replays the ENTIRE IVF path: normalization, the id%37 seed
    // centroids, TWO unrolled Lloyd iterations (assign → 9-dp rounded
    // spherical mean → renormalize, exactly Similarity.ivfFit), the
    // final inverted-list assignment, the nProbe=4 query probe and
    // the rounded rescore. Every dot is the same ascending fold as
    // the ArrayDot codegen loop, so assignments cannot flip; the 9-dp
    // mean rounding is what bridges the one order-dependent step
    // (distributed avg), as the operator contract documents.
    "e3_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
         |nr AS (SELECT vec_id, vd,
         |         sqrt(list_reduce(list_transform(vd, x -> x * x),
         |              (a, b) -> a + b)) AS nrm FROM e),
         |uu AS (SELECT vec_id AS id,
         |         CASE WHEN nrm = 0 THEN vd
         |              ELSE list_transform(vd, x -> x / nrm) END AS un FROM nr),
         |c0 AS (SELECT id AS cid, un AS cvec FROM uu WHERE id % 37 = 0),
         |${lloydIter("c0", "c1")},
         |${lloydIter("c1", "c2")},
         |lst AS (SELECT id AS neighbor_id, cid, un AS cv FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id
         |                 ORDER BY dot DESC, cid ASC) AS rn
         |  FROM (SELECT u3.id, c.cid, u3.un,
         |          list_reduce(list_transform(generate_series(1, 64),
         |            i -> u3.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
         |        FROM uu u3, c2 c) q) WHERE rn = 1),
         |qp AS (SELECT id AS query_id, cid, un AS qv FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id
         |                 ORDER BY dot DESC, cid ASC) AS rn
         |  FROM (SELECT u4.id, c.cid, u4.un,
         |          list_reduce(list_transform(generate_series(1, 64),
         |            i -> u4.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
         |        FROM (SELECT * FROM uu WHERE id % 50 = 0) u4, c2 c) q)
         |  WHERE rn <= 4),
         |sc AS (SELECT query_id, neighbor_id,
         |         round(list_reduce(list_transform(generate_series(1, 64),
         |           i -> qv[i] * cv[i]), (x, y) -> x + y), 4) AS cosine
         |       FROM qp JOIN lst USING (cid)
         |       WHERE query_id <> neighbor_id)
         |SELECT query_id, neighbor_id, cosine, cast(rank AS int) AS rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM sc)
         |WHERE rank <= 10""".stripMargin,

    // e11 replays the e6 fit machinery restricted to the OLD corpus
    // (CTE `uu` — the fit set every lloydIter/pqIter references, here
    // ids % 10 != 0), then assigns the slice (`su`) with the same
    // argmax-dot (centroid) and 6-dp-rounded argmin (codes) contracts
    // as the Spark operators. Codes emit in canonical csv form like
    // e5.
    "e11_ann_incremental" -> annDeltaOracle,

    // e12's oracle IS e11's: the serving path on ModelStore-reloaded
    // centroids/codebook must reproduce the inline fit bit for bit —
    // the hash match proves assignment, encoding AND the persistence
    // round-trip (stamps included) at once.
    "e12_ann_serving" -> annDeltaOracle,
  ) ++ moreOracles

  // e11/e12 replay the e6 fit machinery restricted to the OLD corpus
  // (CTE `uu` — the fit set every lloydIter/pqIter references, here
  // ids % 10 != 0), then assign the slice (`su`) with the same
  // argmax-dot (centroid) and 6-dp-rounded argmin (codes) contracts
  // as the Spark operators. Shared val: a semantics fix can never
  // reach one registration and miss the other.
  private lazy val annDeltaOracle: String =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
         |nr AS (SELECT vec_id, vd,
         |         sqrt(list_reduce(list_transform(vd, x -> x * x),
         |              (a, b) -> a + b)) AS nrm FROM e),
         |au AS (SELECT vec_id AS id,
         |         CASE WHEN nrm = 0 THEN vd
         |              ELSE list_transform(vd, x -> x / nrm) END AS un FROM nr),
         |uu AS (SELECT id, un FROM au WHERE id % 10 <> 0),
         |su AS (SELECT id, un FROM au WHERE id % 10 = 0),
         |c0 AS (SELECT id AS cid, un AS cvec FROM uu WHERE id % 37 = 0),
         |${lloydIter("c0", "c1")},
         |${lloydIter("c1", "c2")},
         |sp AS (SELECT unnest(generate_series(0, 7)) AS s),
         |subs AS (SELECT id, s, un[s * 8 + 1 : s * 8 + 8] AS sub FROM uu, sp),
         |sd AS (SELECT id, un FROM uu ORDER BY id LIMIT 16),
         |cb0 AS (SELECT s, id AS cid, un[s * 8 + 1 : s * 8 + 8] AS cvec
         |        FROM sd, sp),
         |${pqIter("cb0", "cb1")},
         |${pqIter("cb1", "cb2")},
         |asg AS (SELECT id, cid FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id
         |                 ORDER BY dot DESC, cid ASC) AS rn
         |  FROM (SELECT s2.id, c.cid,
         |          list_reduce(list_transform(generate_series(1, 64),
         |            i -> s2.un[i] * c.cvec[i]), (x, y) -> x + y) AS dot
         |        FROM su s2, c2 c) q) WHERE rn = 1),
         |ssub AS (SELECT id, s, un[s * 8 + 1 : s * 8 + 8] AS sub FROM su, sp),
         |scd AS (SELECT id, s, cid AS code FROM (
         |  SELECT q.*, row_number() OVER (PARTITION BY id, s
         |                 ORDER BY d2r ASC, cid ASC) AS rn
         |  FROM (SELECT sb.id, sb.s, c.cid,
         |          round(list_reduce(list_transform(generate_series(1, 8),
         |                  i -> sb.sub[i] * sb.sub[i]), (x, y) -> x + y)
         |            + list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * c.cvec[i]), (x, y) -> x + y)
         |            - 2 * list_reduce(list_transform(generate_series(1, 8),
         |                  i -> c.cvec[i] * sb.sub[i]), (x, y) -> x + y), 6) AS d2r
         |        FROM ssub sb JOIN cb2 c USING (s)) q) WHERE rn = 1),
         |cds AS (SELECT id, string_agg(cast(code AS string), ',' ORDER BY s)
         |          AS codes
         |        FROM scd GROUP BY 1)
         |SELECT a.id AS vec_id, a.cid, c.codes
         |FROM asg a JOIN cds c USING (id)""".stripMargin

  // The remaining oracles (defined after [[annDeltaOracle]] so the
  // shared val can sit next to its two registrations above; lazy —
  // `oracles` initializes first and forces this on demand).
  private lazy val moreOracles: Map[String, String] = Map(
    "e1_knn_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.v, c.v), 4) AS cosine
        |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, cosine, cast(rank AS int) AS rank FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // e8 replays the e1 path, then the vote: weight sums ≤ 10 values
    // that are 4-dp multiples (order-independent under the re-round),
    // argmax on the ROUNDED weight with label asc as the total
    // tie-break — both engines pick identical winners.
    "e8_knn_classify" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.v, c.v), 4) AS cosine
        |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
        |knn AS (SELECT query_id, neighbor_id, cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM scored) WHERE rank <= 10),
        |v AS (SELECT query_id, l.label, count(*) AS votes,
        |        round(sum(cosine), 4) AS weight
        |      FROM knn JOIN e l ON l.vec_id = knn.neighbor_id
        |      GROUP BY 1, 2)
        |SELECT query_id, label, votes, weight FROM (
        |  SELECT v.*, row_number() OVER (PARTITION BY query_id
        |                  ORDER BY weight DESC, label ASC) AS rn FROM v)
        |WHERE rn = 1""".stripMargin,

    // The min_by key encodes (round(dist2, 6), cid) order-preservingly
    // in one double: cid < 16 and cid·1e-9 is far below the 1e-6
    // rounding granularity yet far above the ulp of any dist2 here,
    // so adding it breaks ties by codeword id exactly like the Spark
    // side's struct(dist2, cid).
    "e5_quantize_pq" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |seeds AS (SELECT id AS cid, v AS cv FROM v ORDER BY id LIMIT 16),
        |sp AS (SELECT s FROM (VALUES (0),(1),(2),(3)) t(s)),
        |cent AS (SELECT s, cid, cv[s*16+1 : s*16+16] AS cvec FROM seeds, sp),
        |sub AS (SELECT id, s, v[s*16+1 : s*16+16] AS sub FROM v, sp),
        |a AS (SELECT id, s,
        |        min_by(cid,
        |          round(list_inner_product(sub, sub) + list_inner_product(cvec, cvec)
        |                - 2 * list_inner_product(cvec, sub), 6) + cid * 1e-9) AS code
        |      FROM sub JOIN cent USING (s) GROUP BY 1, 2)
        |SELECT id AS vec_id,
        |  string_agg(cast(code AS string), ',' ORDER BY s) AS codes
        |FROM a GROUP BY 1""".stripMargin,

    // e2 replays the ENTIRE LSH path: normalization (ascending fold,
    // zero-norm pass-through), md5-parity planes, sign-bit buckets,
    // candidate join, rounded rescore, rank — see DuckSql.lshCtes for
    // why the bucket signs are bit-exact, not just tolerance-close.
    "e2_knn_lsh" ->
      s"""WITH ${DuckSql.lshCtes},
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |scored AS (SELECT query_id, neighbor_id,
         |             round(list_reduce(list_transform(generate_series(1, 64),
         |               i -> a.u[i] * b.u[i]), (x, y) -> x + y), 4) AS cosine
         |           FROM cand JOIN u a ON a.vec_id = query_id
         |                     JOIN u b ON b.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, cosine, cast(rank AS int) AS rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,

    // Sign(i, j) is the low bit of md5('i:j') — same digest scheme as
    // the Spark side, so both engines build identical sign matrices;
    // the projection itself is an integer dot, so the sums agree
    // exactly in any order. The outer casts keep j/proj out of
    // DuckDB's HUGEINT (the f12 lesson: a windowed/grouped sum of
    // BIGINT reaches the comparer as a float otherwise).
    "e7_random_projection" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |       WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
        |q AS (SELECT vec_id, list_transform(v, x ->
        |        cast(CASE WHEN mx = mn THEN 0
        |             ELSE greatest(0.0, least(floor((x - mn) * 255.0 / (mx - mn)), 255.0))
        |             END AS bigint)) AS qv FROM m),
        |cj AS (SELECT vec_id, qv, unnest(generate_series(0, 15)) AS j FROM q),
        |cell AS (SELECT vec_id, j, unnest(qv[1 : least(len(qv), 64)]) AS qi,
        |           unnest(generate_series(0, least(len(qv), 64) - 1)) AS i FROM cj)
        |SELECT vec_id, cast(j AS bigint) AS j,
        |  cast(sum(qi * (CASE WHEN (${DuckSql.hash64md5("i || ':' || j")} & 1) = 0
        |                 THEN 1 ELSE -1 END)) AS bigint) AS proj
        |FROM cell GROUP BY 1, 2""".stripMargin,

    "e4_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
        |SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
        |  array_to_string(list_transform(v, x ->
        |    cast(CASE WHEN mx = mn THEN 0
        |         ELSE greatest(0.0, least(floor((x - mn) * 255.0 / (mx - mn)), 255.0))
        |         END AS int)), ',') AS q_csv
        |FROM m""".stripMargin,

    // e9 composes the two proven oracle paths: the e2 LSH replay
    // (DuckSql.lshCtes — CTEs e/nr/u/tj/pl/bk) and the e1 exact knn
    // (renamed ee/eq/esc to avoid CTE collisions), then counts the
    // per-query overlap. Only (query_id, neighbor_id) membership
    // enters the output, so the two sides' cosine roundings never
    // interact; the ratio is small-integer / small-integer at 4 dp.
    "e9_recall_eval" ->
      s"""WITH ${DuckSql.lshCtes},
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |lsc AS (SELECT query_id, neighbor_id,
         |          round(list_reduce(list_transform(generate_series(1, 64),
         |            i -> a.u[i] * b.u[i]), (x, y) -> x + y), 4) AS cosine
         |        FROM cand JOIN u a ON a.vec_id = query_id
         |                  JOIN u b ON b.vec_id = neighbor_id),
         |lknn AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM lsc) WHERE rank <= 10),
         |ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |eq AS (SELECT vec_id, v FROM ee WHERE vec_id % 50 = 0),
         |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          round(list_cosine_similarity(eq.v, c.v), 4) AS cosine
         |        FROM eq JOIN ee c ON eq.vec_id <> c.vec_id),
         |eknn AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM esc) WHERE rank <= 10),
         |m AS (SELECT e.query_id, count(*) AS n_matched
         |      FROM eknn e JOIN lknn l ON l.query_id = e.query_id
         |                             AND l.neighbor_id = e.neighbor_id
         |      GROUP BY 1)
         |SELECT g.query_id, cast(g.n_exact AS bigint) AS n_exact,
         |  cast(coalesce(m.n_matched, 0) AS bigint) AS n_matched,
         |  round(cast(coalesce(m.n_matched, 0) AS double) / g.n_exact, 4) AS recall
         |FROM (SELECT query_id, count(*) AS n_exact FROM eknn GROUP BY 1) g
         |LEFT JOIN m USING (query_id)""".stripMargin,

    // e13 composes the SAME two proven paths as e9 but keeps
    // (cosine, rank) on both sides and folds each ≤10-term series
    // left-to-right in rank order (list_reduce over list(term ORDER
    // BY rank) ≡ the Spark side's aggregate over a rank-sorted
    // array; list_reduce seeds with the first element where Spark
    // seeds 0.0 — equal, since 0.0 + x = x exactly). Terms are 4-dp
    // cosines over log2(rank+1); dcg keeps raw grades, idcg floors
    // at 0.0 — the reference's asymmetry at the cosine grade scale.
    "e13_ndcg_eval" ->
      s"""WITH ${DuckSql.lshCtes},
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |lsc AS (SELECT query_id, neighbor_id,
         |          round(list_reduce(list_transform(generate_series(1, 64),
         |            i -> a.u[i] * b.u[i]), (x, y) -> x + y), 4) AS cosine
         |        FROM cand JOIN u a ON a.vec_id = query_id
         |                  JOIN u b ON b.vec_id = neighbor_id),
         |lknn AS (SELECT query_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM lsc) WHERE rank <= 10),
         |ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |eq AS (SELECT vec_id, v FROM ee WHERE vec_id % 50 = 0),
         |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          round(list_cosine_similarity(eq.v, c.v), 4) AS cosine
         |        FROM eq JOIN ee c ON eq.vec_id <> c.vec_id),
         |eknn AS (SELECT query_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM esc) WHERE rank <= 10),
         |d AS (SELECT query_id,
         |        list_reduce(list(cosine / log2(rank + 1) ORDER BY rank),
         |                    (acc, x) -> acc + x) AS dcg
         |      FROM lknn GROUP BY 1),
         |i AS (SELECT query_id,
         |        list_reduce(list(greatest(cosine, 0.0) / log2(rank + 1)
         |                         ORDER BY rank),
         |                    (acc, x) -> acc + x) AS idcg
         |      FROM eknn GROUP BY 1)
         |SELECT i.query_id,
         |  round(coalesce(d.dcg, 0.0), 6) AS dcg,
         |  round(i.idcg, 6) AS idcg,
         |  round(CASE WHEN i.idcg > 0
         |             THEN coalesce(d.dcg, 0.0) / i.idcg
         |             ELSE 0.0 END, 6) AS ndcg
         |FROM i LEFT JOIN d USING (query_id)""".stripMargin,

    // e10 = e2's replay with the rank stage swapped for the 4-dp
    // threshold (the rounding is part of both engines' contract, so
    // the >= test agrees on every candidate bit-for-bit).
    "e10_range_search" ->
      s"""WITH ${DuckSql.lshCtes},
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |         FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |scored AS (SELECT query_id, neighbor_id,
         |             round(list_reduce(list_transform(generate_series(1, 64),
         |               i -> a.u[i] * b.u[i]), (x, y) -> x + y), 4) AS cosine
         |           FROM cand JOIN u a ON a.vec_id = query_id
         |                     JOIN u b ON b.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, cosine FROM scored
         |WHERE cosine >= 0.35""".stripMargin,
  )
}
