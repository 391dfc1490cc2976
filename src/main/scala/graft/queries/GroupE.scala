package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Group E — similarity search over `embeddings`: exact brute-force
  * kNN as the correctness baseline, hyperplane-LSH ANN as the scale
  * path — both DuckDB-oracled (e2's buckets replay bit-for-bit since
  * round 6; recall vs e1 additionally asserted in SimilarityLshSpec).
  * Only the k-means paths (e3/e6) stay rows-only: a distributed Lloyd
  * fit is not reasonably expressible in one SQL statement. Every 50th
  * vector plays the query set.
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

    // e6: IVF+PQ search (FAISS IVFADC layout) — rows-only for the
    // driver (codebook fit is engine-specific, like e2/e3); the
    // recall floor vs e1 and the loses-nothing-vs-plain-IVF property
    // are pinned in RelationalExtSpec. The inverted lists carry PQ
    // codes instead of vectors, so the candidate join ships ~32×
    // less data — the 10⁹-vector serving shape.
    "e6_knn_ivfpq" -> ((s, d) =>
      Similarity.knnIvfPq(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10)),

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
      val cb = Similarity.pqCodebook(e, "vec_id", "embedding", m = 4, k = 16)
      Similarity.quantizePq(e, "vec_id", "embedding", cb)
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
  )

  val oracles: Map[String, String] = Map(
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
    // zero-norm pass-through), MINSTD-parity planes, sign-bit buckets,
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
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
        |q AS (SELECT vec_id, list_transform(v, x ->
        |        cast(CASE WHEN mx = mn THEN 0
        |             ELSE greatest(0.0, least(floor((x - mn) * 255.0 / (mx - mn)), 255.0))
        |             END AS bigint)) AS qv FROM m),
        |cj AS (SELECT vec_id, qv, unnest(generate_series(0, 15)) AS j FROM q),
        |cell AS (SELECT vec_id, j, unnest(qv) AS qi,
        |           unnest(generate_series(0, len(qv) - 1)) AS i FROM cj)
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
  )
}
