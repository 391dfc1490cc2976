package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Group E — similarity search over `embeddings`: exact brute-force
  * kNN as the correctness baseline (DuckDB oracle), hyperplane-LSH ANN
  * as the scale path (rows-only for the driver; recall vs e1 asserted
  * in SimilaritySpec). Every 50th vector plays the query set.
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

    "e2_knn_lsh" -> ((s, d) =>
      Similarity.knnLsh(queriesSet(s, d), emb(s, d),
        "vec_id", "embedding", k = 10)),

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
