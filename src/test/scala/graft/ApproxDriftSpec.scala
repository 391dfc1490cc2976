package graft

/** Executable accuracy bounds for the declared 100 TB approximate
  * twins (a38 quartiles via percentile_approx, b10 distinct-counts
  * via approx_count_distinct). The measured sf0.1 drift numbers live
  * in SURVEY §8 (graft.tools.ApproxDrift prints them); these specs
  * keep the twins' CONTRACT green in CI at sf0.001: everything the
  * twin does not approximate is byte-identical, and the approximated
  * cells stay within loose, always-valid bounds. */
class ApproxDriftSpec extends GraftSuite {

  test("a38 approx twin: only the quartiles move, and stay in-range") {
    val exact = queries.GroupA4.rankDescribeOf(spark, sfDir)
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    val approx = queries.GroupA4
      .rankDescribeOf(spark, sfDir, approxQuartiles = true)
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    assert(exact.keySet == approx.keySet && exact.size == 3)
    for (s <- exact.keySet) {
      val (e, a) = (exact(s), approx(s))
      // Everything outside the quartile branch is byte-identical.
      for (c <- Seq("n", "mean", "std", "vmin", "vmax", "top10"))
        assert(e.getAs[Any](c) == a.getAs[Any](c), s"$s.$c drifted")
      val (mn, mx) = (e.getAs[Double]("vmin"), e.getAs[Double]("vmax"))
      for (c <- Seq("p25", "p50", "p75")) {
        val (ev, av) = (e.getAs[Double](c), a.getAs[Double](c))
        // The sketch returns an actual element; the exact form
        // interpolates between two adjacent elements — so the drift
        // is one inter-element spacing, far inside 5% of the range
        // on any series this size.
        assert(av >= mn && av <= mx, s"$s.$c=$av outside [$mn,$mx]")
        assert(math.abs(av - ev) <= 0.05 * (mx - mn) + 1e-9,
          s"$s.$c approx $av vs exact $ev exceeds 5%% of range")
      }
      // Quartiles stay monotone in both forms.
      assert(a.getAs[Double]("p25") <= a.getAs[Double]("p50") &&
        a.getAs[Double]("p50") <= a.getAs[Double]("p75"))
    }
  }

  test("b10 approx twin: sketched counts within 3x the declared rsd") {
    val cols = Seq("uniq_member_types", "uniq_pairs", "n_coll_types")
    val all = ("type_mentions" +: cols) ++ Seq("n_articles", "wo_types")
    val e = queries.GroupB.typeCoverageAuditOf(spark, sfDir)
      .select(all.head, all.drop(1): _*).collect()(0)
    val a = queries.GroupB.typeCoverageAuditOf(spark, sfDir, approx = true)
      .select(all.head, all.drop(1): _*).collect()(0)
    // Non-sketched cells are identical.
    assert(e.getLong(0) == a.getLong(0), "type_mentions must be exact")
    assert(e.getLong(4) == a.getLong(4) && e.getLong(5) == a.getLong(5))
    // HLL++ rsd is 0.05 by default; 3x rsd is a >99.7% band even at
    // large cardinalities, and near-exact at these.
    cols.zipWithIndex.foreach { case (c, i) =>
      val (ev, av) = (e.getLong(i + 1).toDouble, a.getLong(i + 1).toDouble)
      assert(math.abs(av - ev) <= 0.15 * ev + 1.0,
        s"$c approx $av vs exact $ev exceeds 3x rsd")
    }
  }

  test("g9 native HLL: estimate-vs-truth within 3 sigma on every real group") {
    // g9's ESTIMATE is already hash-gated by the DuckDB oracle (the
    // md5 registers replay bit-for-bit); this pins the estimate
    // against the TRUE distinct counts (g5's exact form) on the real
    // events table — the accuracy contract, per group, at b = 8
    // (sigma = 1.04/sqrt(256) = 6.5%). Small groups ride the
    // linear-counting branch, near-exact; the +3 absolute slack
    // covers integer-granularity at n < ~15. The sf0.1 drift
    // DISTRIBUTION is printed by graft.tools.ApproxDrift and
    // recorded in SURVEY §8.
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("g5_window_distinct")(spark, sfDir)
      .select(col("window_es"), col("event_type"),
        col("n_users").cast("double"))
    val joined = exact.join(
        queries.GroupG.hllOf(Tables(spark, sfDir, "events")),
        Seq("window_es", "event_type"))
      .select(col("n_users"), col("n_approx"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(joined.nonEmpty)
    joined.foreach { case (n, ap) =>
      assert(math.abs(n - ap) <= 3.0 + 3 * 0.065 * n,
        s"g9 HLL drift beyond 3 sigma: exact $n estimate $ap")
    }
  }
}
