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
  )
}
