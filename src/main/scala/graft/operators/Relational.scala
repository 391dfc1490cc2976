package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational building blocks used across the collection
  * pipeline. All of them are declarative DataFrame transformations so
  * Catalyst keeps the whole plan optimizable (pushdown through them,
  * partial aggregation, AQE skew handling on their shuffles).
  */
object Relational {

  /** Top-k rows per group, deterministic given a total tiebreak order.
    *
    * Spark-first replacement for the reference's "sort members, take
    * top 10" (collection-templates scripts/prepare_collections2.py:181)
    * — a rank window over data already shuffled by the group key, so
    * it costs exactly one shuffle and streams per-group.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], k: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Keep exactly one row per key — the first under `orderCols`.
    * (reference: uniq_members in scripts/prepare_members_names.py:55,
    * which keeps the highest-ranked duplicate of a curated name.)
    */
  def firstByKey(df: DataFrame, keyCols: Seq[Column],
                 orderCols: Seq[Column]): DataFrame =
    topKPerGroup(df, keyCols, orderCols, 1, "__rn").drop("__rn")

  /** Snapshot diff: classify rows of `current` vs `previous` into
    * insert / update / archive / unchanged by full outer join on `key`
    * and comparing `fingerprint` (any deterministic Column over the
    * payload). This is the reference's Elasticsearch sync
    * (scripts/update_elasticsearch.py) as one shuffle instead of a
    * driver-side hash index.
    */
  def diffSnapshots(current: DataFrame, previous: DataFrame,
                    key: String, fingerprint: Column): DataFrame = {
    val cur = current.select(col(key).as("k"), fingerprint.as("cur_fp"))
    val prev = previous.select(col(key).as("k"), fingerprint.as("prev_fp"))
    cur.join(prev, Seq("k"), "full_outer")
      .select(
        col("k").as(key),
        when(col("prev_fp").isNull, lit("insert"))
          .when(col("cur_fp").isNull, lit("archive"))
          .when(col("cur_fp") =!= col("prev_fp"), lit("update"))
          .otherwise(lit("unchanged")).as("op"))
  }
}
