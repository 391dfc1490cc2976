package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.broadcast

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

  /** Domain-mixture sampling: the static form of training-mixture
    * weighting (The Pile / DoReMi-style domain weights applied as a
    * one-pass corpus cut). Given target proportions per domain,
    * returns the LARGEST sample whose domain shares match the targets
    * without upsampling: the feasible total is T = min_d(n_d / w_d)
    * (the binding domain is kept ~whole), every other domain keeps
    * rate w_d·T/n_d, and the keep decision is the same content-keyed
    * md5 bucket as [[stratifiedSample]] — reproducible across runs,
    * engines, and partitionings. Domains not in `weights` are dropped
    * (the mixture DEFINES the corpus); upsampling scarce domains is
    * an epoch/loader concern, not a corpus-cut concern.
    *
    * Scale shape: the corpus is touched exactly twice — one
    * map-side-combinable count per domain (|domains| rows out), and
    * one narrow filter pass. The rate table (counts × the 1-row
    * feasible-total agg) is |domains| rows, joined back with an
    * explicit broadcast; no wide operation ever sees corpus-sized
    * data. Rates quantize to 1/`grain` (floor — the sample never
    * overshoots a target share); raise `grain` if domains are huge.
    *
    * Cross-engine exactness: T and the per-domain rates are the same
    * fixed-order double expressions in both engines (a global MIN is
    * order-free), and the bucket test is integer; DuckDB literal
    * weights must be cast `::DOUBLE` in the oracle (its bare decimal
    * literals are DECIMAL, whose division is not IEEE double math).
    */
  def mixtureSample(df: DataFrame, keyCol: Column, domainCol: Column,
                    weights: Map[String, Double],
                    grain: Int = 1000000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureSample: weights must be non-empty and positive")
    // The rates dim's key is "__mix_domain", never "domain": the
    // caller's most natural column name IS "domain", and a bare
    // col("domain") in the join condition would resolve against both
    // sides — AMBIGUOUS_REFERENCE at analysis time (r12 review).
    val wcol = weights.foldLeft(lit(null).cast("double")) {
      case (els, (s, w)) => when(col("__mix_domain") === s, lit(w)).otherwise(els)
    }
    val counts = df.select(domainCol.as("__mix_domain"))
      .groupBy("__mix_domain").agg(count(lit(1)).as("n"))
      .withColumn("w", wcol).filter(col("w").isNotNull)
    val feasible = counts.agg(min(col("n").cast("double") / col("w")).as("t"))
    val rates = counts.crossJoin(broadcast(feasible))
      .select(col("__mix_domain"),
        least(lit(grain.toLong),
          floor(col("w") * col("t") / col("n") * grain)).as("keep_buckets"))
    df.join(broadcast(rates), domainCol === col("__mix_domain"))
      .filter(hashBucket(keyCol, grain) < col("keep_buckets"))
      .drop("__mix_domain", "keep_buckets")
  }

  /** Epoch-based mixture materialization — the UPSAMPLING half
    * [[mixtureSample]] deliberately excludes: given target epochs per
    * domain (The Pile's epochs column — how many times each domain's
    * data is seen in one training pass), emit each row
    * `floor(epochs)` times plus one more for the deterministic
    * `frac(epochs)` fraction of rows, as (…, copy_idx) with copy_idx
    * in [1, n_copies]. Domains without an epoch target drop. The
    * fractional pick reuses the content-keyed md5 bucket SALTED with
    * ":ep" so it is independent of any [[stratifiedSample]] /
    * [[mixtureSample]] cut on the same key (an unsalted reuse would
    * correlate the two decisions and bias the joint sample).
    *
    * Scale shape: one narrow projection + an explode whose fan-out is
    * exactly the epoch multiplier — no shuffle, no RNG state, and the
    * copies are born tagged so a downstream shuffle/pack stage can
    * interleave them (materializing epochs is the loader-side step
    * between the corpus cut and sequence packing).
    */
  def epochMixture(df: DataFrame, keyCol: Column, domainCol: Column,
                   epochs: Map[String, Double],
                   grain: Int = 1000000): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(_ > 0),
      "epochMixture: epochs must be non-empty and positive")
    val e = epochs.foldLeft(lit(null).cast("double")) {
      case (els, (s, v)) => when(domainCol === s, lit(v)).otherwise(els)
    }
    val fracBuckets = floor((e - floor(e)) * grain).cast("long")
    val copies = (floor(e).cast("long") +
      when(hashBucket(concat(keyCol.cast("string"), lit(":ep")), grain)
        < fracBuckets, lit(1L)).otherwise(lit(0L))).as("n_copies")
    df.filter(e.isNotNull)
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * IPL 2006): each row draws a deterministic uniform u from its
    * key's md5 and competes with priority u^(1/w); the top `n`
    * priorities ARE a weight-proportional sample without replacement.
    * Ranking on ln(u)/w (the monotone log form) avoids pow() — one
    * ln and one division, both IEEE-identical across engines. The
    * uniform is ((hash64md5(salt:key) & (2^53-1)) + 1) / 2^53 ∈
    * (0, 1], exact in a double, so a different engine reproduces the
    * SELECTED SET bit-for-bit, not just approximately — the
    * reproducibility contract of the whole sampling family.
    *
    * Scale shape: one narrow projection then a global top-n —
    * TakeOrdered (per-partition top-n, driver merge of n·partitions
    * rows), NEVER a full sort of the corpus; n is the sample size, a
    * driver-safe quantity by definition. Rows with w ≤ 0, null, or
    * NaN cannot be sampled and are dropped — NaN explicitly, because
    * BOTH engines evaluate NaN > 0 as true AND sort NaN greatest, so
    * without the guard a handful of corrupt weights would pass the
    * filter, rank above every real priority (ln(u)/NaN = NaN), and
    * CROWD OUT the entire sample — identically on both engines, i.e.
    * invisible to the oracle gate (r13 review). A +Infinity weight
    * stays legitimately sampleable: ln(u)/∞ = -0.0 is the maximal
    * priority, exactly the w → ∞ limit of u^(1/w) → 1. Returns (id,
    * weight, priority = ln(u)/w rounded 6dp for a stable observable).
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     n: Int, salt: String = "ws"): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1, got $n")
    val mask = (1L << 53) - 1
    // Built from the RENAMED id column so the uniform is defined on
    // this frame regardless of what expression keyCol was.
    val u = ((graft.functions.Text.hash64md5(
        concat(lit(salt + ":"), col("id").cast("string")))
      .bitwiseAND(lit(mask)) + lit(1L)).cast("double")) / lit((1L << 53).toDouble)
    df.select(keyCol.as("id"), weightCol.cast("double").as("weight"))
      .filter(col("weight") > 0 && !isnan(col("weight")))
      .withColumn("lnkey", log(u) / col("weight"))
      .orderBy(col("lnkey").desc, col("id"))
      .limit(n)
      .select(col("id"), col("weight"), round(col("lnkey"), 6).as("priority"))
  }
}
