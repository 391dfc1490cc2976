package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** g9's deterministic HyperLogLog: a plain-Scala replay of the whole
  * estimator, the accuracy bound vs exact distinct on the real events
  * table, and the set-semantics / sizing contracts. */
class SketchesSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** The operator's math, independently: b=8 registers over 56-bit
    * ranks, exact-integer harmonic sum, linear-counting branch. */
  private def hllScala(keys: Seq[String]): Double = {
    val regs = new Array[Int](256)
    for (k <- keys) {
      val h = md5Long(k)
      val bucket = (h & 255L).toInt
      val w = h >>> 8
      val rho = if (w == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val zeros = regs.count(_ == 0)
    var s = BigInt(0)
    for (r <- regs if r > 0) s += BigInt(1) << (57 - r)
    s += BigInt(zeros) * (BigInt(1) << 57)
    val alphaNum = 0.7213 / (1.0 + 1.079 / 256) * 256.0 * 256.0 * math.pow(2.0, 57)
    val raw = alphaNum / s.toDouble
    val est = if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros) else raw
    math.rint(est * 10000) / 10000 // HALF_EVEN differs from round() only AT .00005 exactly
  }

  test("hll: operator estimate equals the plain-Scala replay") {
    for (n <- Seq(3, 120, 5000)) {
      val keys = (0 until n).map(i => s"key-$i")
      val got = Sketches.hllDistinct(
          keys.toDF("k").withColumn("g", lit(1)), Seq("g"), col("k"))
        .select("n_approx").as[Double].head()
      val want = hllScala(keys)
      assert(math.abs(got - want) < 1e-3, s"n=$n got $got want $want")
    }
  }

  test("hll: estimate is a set property — duplicates don't move it") {
    val keys = (0 until 400).map(i => s"key-$i")
    def est(ks: Seq[String]): Double = Sketches.hllDistinct(
        ks.toDF("k").withColumn("g", lit(1)), Seq("g"), col("k"))
      .select("n_approx").as[Double].head()
    assert(est(keys) == est(keys ++ keys ++ keys.take(57)))
  }

  test("hll: null keys are excluded like count_distinct, not phantom registers") {
    // r12 review: a null key hashed to a null __bucket register —
    // counted into __present but contributing a null term — which
    // shrank the zero-register denominator and inflated the group's
    // estimate. Contract: nulls don't count, exactly as in the exact
    // count_distinct the sketch stands in for.
    val keys = (0 until 400).map(i => s"key-$i")
    def est(ks: Seq[String]): Double = Sketches.hllDistinct(
        ks.toDF("k").withColumn("g", lit(1)), Seq("g"), col("k"))
      .select("n_approx").as[Double].head()
    val withNulls = Sketches.hllDistinct(
        (keys.map(Option(_)) ++ Seq(None, None, None)).toDF("k")
          .withColumn("g", lit(1)), Seq("g"), col("k"))
      .select("n_approx").as[Double].head()
    assert(withNulls == est(keys), "null keys must not move the estimate")
  }

  test("cms: one estimate row per probe ROW — duplicates preserved") {
    // r12 review: the old groupBy over the probe columns collapsed
    // fully-identical probe rows; the contract is per-row.
    val cms = Sketches.cmsCounters(
      Seq("a", "a", "b").toDF("k"), "k")
    val est = Sketches.cmsEstimate(cms,
        Seq("a", "a", "b").toDF("k"), "k")
      .as[(String, Long)].collect().toSeq.sorted
    assert(est == Seq(("a", 2L), ("a", 2L), ("b", 1L)), s"got $est")
  }

  test("hll: within the error bound of exact distinct on real events") {
    val e = Tables(spark, sfDir, "events").filter($"ts".isNotNull)
      .select((floor($"ts".cast("double") / 3600).cast("long") * 3600)
          .as("window_es"),
        $"event_type", concat(lit("u:"), $"user_id".cast("string")).as("ukey"))
    val approx = Sketches.hllDistinct(e, Seq("window_es", "event_type"), $"ukey")
    val exact = e.groupBy("window_es", "event_type")
      .agg(countDistinct($"ukey").as("n_exact"))
    val errs = approx.join(exact, Seq("window_es", "event_type"))
      .select(abs($"n_approx" - $"n_exact"), $"n_exact".cast("double"))
      .as[(Double, Double)].collect()
    assert(errs.nonEmpty)
    // 1.04/sqrt(256) = 6.5% standard error. Tiny groups are dominated
    // by register-collision granularity (2 users in 1 register reads
    // ~1), so the per-group bound is absolute-or-relative; the MEAN
    // relative error is where the estimator's quality shows.
    for ((ae, ex) <- errs)
      assert(ae <= 3.0 || ae / ex < 0.30, s"err $ae on exact $ex")
    val meanRel = errs.map { case (ae, ex) => ae / ex }.sum / errs.length
    assert(meanRel < 0.08, s"mean rel err $meanRel")
  }

  test("hll: register-precision bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(Seq("a").toDF("k").withColumn("g", lit(1)),
        Seq("g"), col("k"), b = 5)
    }
  }

  // --- count-min -----------------------------------------------------

  test("cms: estimates replay in plain Scala and never underestimate") {
    val depth = 4; val width = 256
    // key-j occurs j+1 times → known exact counts with forced load.
    val stream = (0 until 60).flatMap(j => Seq.fill(j + 1)(s"key-$j"))
    val counters = Array.ofDim[Long](depth, width)
    // Kirsch–Mitzenmacher replay: one digest, positions (h1 + i·h2)
    // mod width over its unsigned 32-bit words, h2 forced odd.
    def pos(k: String, i: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms:$k".getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.wrap(d)
      val h1 = bb.getInt(0) & 0xFFFFFFFFL
      val h2 = (bb.getInt(4) & 0xFFFFFFFFL) | 1L
      ((h1 + i * h2) % width).toInt
    }
    for (k <- stream; i <- 0 until depth) counters(i)(pos(k, i)) += 1
    val cms = Sketches.cmsCounters(stream.toDF("k"), "k", depth, width)
    val got = Sketches.cmsEstimate(cms,
        (0 until 60).map(j => s"key-$j").toDF("k"), "k", depth, width)
      .as[(String, Long)].collect().toMap
    for (j <- 0 until 60) {
      val k = s"key-$j"
      val want = (0 until depth).map(i => counters(i)(pos(k, i))).min
      assert(got(k) == want, k)
      assert(got(k) >= j + 1, s"underestimate on $k")
    }
  }

  test("cms: unseen keys mostly read zero; absent cells are zero not null") {
    val cms = Sketches.cmsCounters(
      (0 until 200).map(i => s"in-$i").toDF("k"), "k")
    val est = Sketches.cmsEstimate(cms,
        (0 until 200).map(i => s"out-$i").toDF("k"), "k")
      .as[(String, Long)].collect()
    assert(est.forall(_._2 >= 0))
    // 200 items in 4×1024 cells: a 4-way collision is ~(200/1024)^4.
    assert(est.count(_._2 > 0) <= 2, "too many false counts")
  }

  test("g9 oracle interpolates the real alpha numerator, not an init-order 0.0") {
    // Regression: hllAlphaNum was a val declared BELOW the oracle map
    // that interpolates it — object init order made the captured
    // literal 0.0, poisoning the raw branch (every gate group took
    // linear counting, so the hash gate could not see it). The same
    // formula here must appear verbatim in the shipped SQL.
    val alpha = 0.7213 / (1.0 + 1.079 / 256) * 256.0 * 256.0 * math.pow(2.0, 57)
    val sql = graft.SparkEntry.oracleSql("g9_hll_distinct")
    assert(sql.contains(alpha.toString), s"expected $alpha in g9 oracle")
    assert(!sql.contains("0.0 / cast"), "uninitialized alpha numerator")
  }

  test("cms: depth/width bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(Seq("a").toDF("k"), "k", depth = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(Seq("a").toDF("k"), "k", width = 1)
    }
  }
}
