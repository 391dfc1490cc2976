package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state cardinality sketches. [[Dedup.bloomBits]] compresses
  * a SET to bits; this compresses a COUNT: the sketch forms that keep
  * per-group state fixed-size no matter how many distinct values flow
  * through — the property that lets a distinct-count run at any scale
  * (g5's exact two-level form keys its first shuffle on every distinct
  * (group, value); the HLL register frame is capped at groups × 2^b
  * rows after the map-side partial max).
  */
object Sketches {

  /** Deterministic HyperLogLog (Flajolet et al., AofA 2007) distinct
    * count per group: ±1.04/√(2^b) standard error with 2^b longs of
    * per-group state. Differences from `approx_count_distinct` (the
    * same algorithm): the hash is the md5 family ([[Text.hash64md5]]),
    * so every register value — and therefore the ESTIMATE, bit for
    * bit — is reproducible by any engine; and the register frame is a
    * first-class DataFrame stage, so the two aggregations are both
    * map-side combinable (partial max over registers, then the
    * harmonic sum). Estimator: bucket = low b hash bits, rho = leading
    * -zero rank of the remaining 64-b bits; Z is assembled from EXACT
    * integer terms 2^(wBits+1-rho) summed as DECIMAL(38,0) — the
    * float path is one division at the end plus the small-range
    * linear-counting branch (m·ln(m/zeros) when raw ≤ 2.5m), so there
    * is no accumulation-order drift. No large-range correction: with
    * 64-bit hashes the 2^32 saturation the original paper corrects
    * for is unreachable. Output: groupCols + n_approx (4-dp double).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
                  b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 20,
      s"b must be in [7, 20] (alpha constant assumes m >= 128), got $b")
    val m = 1 << b
    val wBits = 64 - b
    val scaleBits = wBits + 1 // terms 2^(scaleBits - rho) are integers
    val alphaNum = 0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble *
      math.pow(2.0, scaleBits) // exact: a power of two scales the double
    val h = Text.hash64md5(key)
    val w = shiftrightunsigned(h, b)
    val rho = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    // Null keys drop at the door — count-distinct semantics (exact
    // count_distinct skips nulls too). Unfiltered, a null key hashes
    // to a PHANTOM null register row: counted into __present but
    // contributing a null term, it removes one full zero-register
    // term from the denominator and silently inflates every estimate
    // in its group (r12 review). One residual asymmetry, documented:
    // a group whose EVERY key is null emits no row here where the
    // exact form would emit 0 — such a group has nothing to estimate.
    val regs = df.filter(key.isNotNull)
      .groupBy((groupCols.map(col) :+
        h.bitwiseAND(lit((m - 1).toLong)).as("__bucket")): _*)
      .agg(max(rho).as("__mr"))
    val term =
      expr(s"cast(shiftleft(cast(1 as bigint), $scaleBits - __mr) as decimal(38,0))")
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__present"), sum(term).as("__s"))
      .withColumn("__zeros", lit(m.toLong) - col("__present"))
      .withColumn("__raw",
        lit(alphaNum) /
          (col("__s") + col("__zeros").cast("decimal(38,0)") *
            lit(1L << scaleBits).cast("decimal(38,0)")).cast("double"))
      .withColumn("n_approx",
        round(when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros").cast("double")))
          .otherwise(col("__raw")), 4))
      .select((groupCols.map(col) :+ col("n_approx")): _*)
  }

  /** Shared (row, i, pos) fan-out of [[cmsCounters]] / [[cmsEstimate]]
    * — one hash definition, so build and probe can never disagree.
    * Null keys hash as the empty string.
    *
    * ONE md5 per key, not one per depth row: the depth positions are
    * Kirsch–Mitzenmacher double hashes g_i = (h1 + i·h2) mod width
    * over the digest's first two 32-bit words (Kirsch & Mitzenmacher,
    * ESA'06 — pairwise independence is preserved, which is all the
    * count-min error bound uses). h2 is forced odd so the stride is a
    * bijection mod any power-of-two width. All arithmetic stays below
    * 2^35 — exact in any engine, and the digest cost no longer scales
    * with depth (the per-depth-digest form measured ~2.5× slower on
    * the build side at sf0.1). */
  private def cmsPositions(df: DataFrame, keyCol: String, depth: Int,
                           width: Int): DataFrame = {
    val key = coalesce(col(keyCol).cast("string"), lit(""))
    df.withColumn("__hx", md5(concat(lit("cms:"), key).cast("binary")))
      .withColumn("__h1", conv(substring(col("__hx"), 1, 8), 16, 10).cast("long"))
      .withColumn("__h2",
        conv(substring(col("__hx"), 9, 8), 16, 10).cast("long").bitwiseOR(lit(1L)))
      .withColumn("__ip", explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"),
          pmod(col("__h1") + lit(i.toLong) * col("__h2"),
            lit(width.toLong)).as("pos"))): _*)))
      .withColumn("i", col("__ip.i")).withColumn("pos", col("__ip.pos"))
      .drop("__ip", "__hx", "__h1", "__h2")
  }

  /** Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) counters
    * for a stream of items: `depth` × `width` cells as (i, pos, cnt)
    * rows — ≤ depth·width rows TOTAL, a dim no matter how many items
    * flowed through. One map-side-combinable count after a narrow
    * depth-row fan-out; the corpus is touched exactly once. Point
    * estimates ([[cmsEstimate]]) overestimate by at most e/width · N
    * with probability 1 − e^(−depth). md5-derived KM positions (one
    * digest per item — see [[cmsPositions]]) make the counters — and
    * every estimate — engine-replayable.
    *
    * SIZING (the defaults are sf-scale, not cluster-scale): for a
    * target absolute overcount ε·N pick width ≈ e/ε — e.g. ±0.01% of
    * a 10¹² item stream needs width ≈ 27 000 (~2⁷ KB per depth row
    * as longs) — and depth = ceil(ln 1/δ) for failure probability δ
    * (depth 4 ≈ δ 0.018, depth 7 ≈ δ 0.001). The sketch stays a
    * broadcastable dim at ANY width a single machine would ever use;
    * the only corpus-scale cost is the depth-row fan-out, linear in
    * depth. */
  def cmsCounters(items: DataFrame, keyCol: String, depth: Int = 4,
                  width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    cmsPositions(items.select(keyCol), keyCol, depth, width)
      .groupBy("i", "pos").agg(count(lit(1)).as("cnt"))
  }

  /** Frequency estimate for each probe row against [[cmsCounters]]:
    * min over the depth counters its key hashes to (absent cells are
    * 0 — only possible for keys the build never saw). NEVER an
    * underestimate; that one-sided error is what makes the sketch
    * composable with exact confirmation stages. The probe side joins
    * on (i, pos) against the counter dim. depth/width MUST match the
    * build call. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    // The guard covers cmsPositions' working names too — a colliding
    // probe column would be silently overwritten and then dropped,
    // surfacing later as an unresolved-column error naming an
    // internal the caller never created (r12 review).
    require(!probes.columns.exists(
      Set("i", "pos", "n_est", "__cnt", "__hx", "__h1", "__h2", "__ip", "__pid")),
      "cmsEstimate: probe frame may not contain columns " +
        "i/pos/n_est/__cnt/__hx/__h1/__h2/__ip/__pid " +
        "(the sketch's working/output names)")
    val probeCols = probes.columns.map(col).toSeq
    // Collapse the depth fan-out PER PROBE ROW, not per distinct probe
    // value: the contract is one estimate per row, and a per-partition
    // row id (stable under task retry — partition << 33 + index) keeps
    // duplicate probe rows distinct without joining on possibly-null
    // probe columns (r12 review: groupBy over the probe columns
    // silently collapsed duplicates).
    cmsPositions(probes.withColumn("__pid", monotonically_increasing_id()),
        keyCol, depth, width)
      .join(counters.select(col("i"), col("pos"), col("cnt").as("__cnt")),
            Seq("i", "pos"), "left")
      .groupBy(col("__pid") +: probeCols: _*)
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("n_est"))
      .drop("__pid")
  }
}
