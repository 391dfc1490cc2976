package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: rate control
  * per stratum (e.g. language, source, quality band) with a
  * content-keyed hash instead of an RNG, so a sample is reproducible
  * across runs, engines, and partitionings — the property curriculum /
  * ablation pipelines need. (Reference analogue: collection-templates
  * filters collections by type/denylist rules —
  * scripts/merge_lists_and_categories.py — this generalizes the
  * keep/drop decision to rate-based.)
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, `buckets`) from a key column:
    * first 8 hex digits of md5, as a number, mod `buckets`. md5 (not
    * xxhash64) so any engine reproduces the bucket — the DuckDB
    * oracle computes the identical expression. Also the deterministic
    * stand-in for the reference's id-seeded PRNG picks
    * (prepare_collections2.py:63 `random.seed(collection.item)`).
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep each row iff its hash bucket falls under its stratum's
    * percentage. `rates` maps stratum value → keep-percentage [0,100];
    * strata not listed fall back to `defaultRate`. Pure narrow
    * filter — no shuffle, no RNG state, embarrassingly parallel.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (els, (s, r)) =>
      when(stratumCol === s, lit(r)).otherwise(els)
    }
    df.filter(hashBucket(keyCol) < rate)
  }
}
