package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the Group F text-analysis and Group G event
  * queries beyond the smoke/oracle gates: invariants that should hold
  * on any input, checked on sf0.001.
  */
class TextEventsSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("a34: emoji-aware tokenization matches the reference's split rules") {
    // load_custom_collections.py emoji_split/tokenize_name semantics:
    // emoji survive as tokens, ZWJ sequences and skin-tone modifiers
    // stay ONE token, text splits on [a-zA-Z0-9']+.
    val got = Seq(
      "fire 🔥drill",      // emoji glued to a word still separates
      "a🧡💛b",            // adjacent distinct emoji = separate tokens
      "thumbs 👍🏽 up",     // modifier attaches
      "family 👨‍👩‍👧 day",  // ZWJ sequence is one token
      "don't stop-me")     // apostrophe kept, dash splits
      .toDF("name")
      .select(graft.functions.Text.emojiTokens(col("name")).as("t"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("fire", "🔥", "drill"))
    assert(got(1) === Seq("a", "🧡", "💛", "b"))
    assert(got(2) === Seq("thumbs", "👍🏽", "up"))
    assert(got(3) === Seq("family", "👨‍👩‍👧", "day"))
    assert(got(4) === Seq("don't", "stop", "me"))
  }

  test("f1: distinct tokens never exceed total tokens") {
    val bad = SparkEntry.queries("f1_token_stats")(spark, sfDir)
      .filter($"n_distinct" > $"n_tokens" || $"n_tokens" < 0).count()
    assert(bad == 0)
  }

  test("f2: quality and ratios stay in [0, 1]") {
    val q = SparkEntry.queries("f2_quality_score")(spark, sfDir)
    val bad = q.filter($"quality" < 0 || $"quality" > 1 ||
      $"punct_ratio" < 0 || $"punct_ratio" > 1 ||
      $"stopword_ratio" < 0 || $"stopword_ratio" > 1).count()
    assert(bad == 0)
  }

  test("f3: every document gets a guess from the closed label set") {
    val langs = SparkEntry.queries("f3_lang_id")(spark, sfDir)
      .select("guess").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("f4: fingerprint is a function of content — equal text, equal fp") {
    val docs = Tables(spark, sfDir, "documents")
    val fp = SparkEntry.queries("f4_fingerprint")(spark, sfDir)
    val joined = docs.select($"doc_id", md5($"text").as("th"))
      .join(fp, "doc_id")
    val groups = joined.groupBy("th")
      .agg(countDistinct("fingerprint").as("nfp"))
      .filter($"nfp" > 1).count()
    assert(groups == 0, "same text hashed to different fingerprints")
  }

  test("f6: planted PII is scrubbed, clean text untouched") {
    import graft.functions.Text
    val df = Seq(
      "contact me at jane.doe+x@example.co.uk or +1-555-123-4567",
      "server 192.168.0.1 responded; backup at 10.0.0.255",
      "no pii here, just words").toDF("text")
    val out = df.select(Text.scrubPii($"text").as("s")).as[String].collect()
    assert(out(0) == "contact me at <EMAIL> or <PHONE>")
    assert(out(1) == "server <IP> responded; backup at <IP>")
    assert(out(2) == "no pii here, just words")
  }

  test("f7: approx_percentile tracks the exact percentiles (the 100 TB form)") {
    // The oracled f7 uses exact interpolated percentiles; at scale the
    // same groupBy runs approx_percentile (mergeable t-digest-style
    // sketch, no per-group sort). Pin the drift so swapping is safe:
    // with accuracy 10000 on these group sizes the sketch's p50/p95
    // must land within one token of the exact value's neighborhood.
    val exact = SparkEntry.queries("f7_token_percentiles")(spark, sfDir)
    val toks = Tables(spark, sfDir, "documents")
      .select($"lang", size(graft.functions.Text.tokens($"text")).cast("long").as("n_tokens"))
    val approx = toks.groupBy("lang")
      .agg(expr("approx_percentile(n_tokens, array(0.5D, 0.95D), 10000)").as("ap"))
      .select($"lang", $"ap"(0).as("ap50"), $"ap"(1).as("ap95"))
    val joined = exact.join(approx, "lang")
      .select($"lang", $"p50", $"ap50".cast("double"), $"p95", $"ap95".cast("double"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(joined.nonEmpty)
    // approx_percentile returns an actual data value while percentile
    // interpolates between order statistics, so the gap scales with
    // the local spacing of the distribution — bound it relatively,
    // not by a fixed count.
    joined.foreach { case (lang, p50, ap50, p95, ap95) =>
      assert(math.abs(p50 - ap50) <= math.max(2.0, 0.1 * p50),
        s"$lang p50 drift: exact $p50 approx $ap50")
      assert(math.abs(p95 - ap95) <= math.max(2.0, 0.1 * p95),
        s"$lang p95 drift: exact $p95 approx $ap95")
    }
  }

  test("g1: sessions of one user never overlap and respect the gap") {
    val s = SparkEntry.queries("g1_sessionize")(spark, sfDir)
    // Consecutive sessions per user must be separated by > 1800s.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_es")
    val bad = s.withColumn("prev_end", lag($"end_es", 1).over(w))
      .filter($"prev_end".isNotNull && $"start_es" - $"prev_end" <= 1800)
      .count()
    assert(bad == 0, "adjacent sessions within the 30-min gap")
  }

  test("g1: session event counts sum to the event count") {
    val total = Tables(spark, sfDir, "events").count()
    val summed = SparkEntry.queries("g1_sessionize")(spark, sfDir)
      .agg(sum("n_events")).as[Long].head()
    assert(summed == total)
  }

  test("g2: window starts are aligned to 900s and counts sum to total") {
    val g2 = SparkEntry.queries("g2_tumbling_counts")(spark, sfDir)
    assert(g2.filter($"window_es" % 900 =!= 0).count() == 0)
    val total = Tables(spark, sfDir, "events").count()
    assert(g2.agg(sum("n")).as[Long].head() == total)
  }

  test("g5: approx_count_distinct tracks the exact user counts (the HLL form)") {
    // The oracled g5 is the two-level exact form; when exact counts
    // aren't required the same groupBy runs approx_count_distinct —
    // a fixed-size mergeable HLL sketch, one aggregation pass. Pin the
    // drift so swapping is a config decision, not a semantics change:
    // rsd 0.02 must stay within 5% of exact on every window.
    val exact = SparkEntry.queries("g5_window_distinct")(spark, sfDir)
    val approx = Tables(spark, sfDir, "events")
      .filter($"ts".isNotNull)
      .groupBy((floor($"ts".cast("double") / 3600).cast("long") * 3600)
                 .as("window_es"), $"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("ap"))
    val joined = exact.join(approx, Seq("window_es", "event_type"))
      .select($"n_users".cast("double"), $"ap".cast("double"))
      .as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (n, ap) =>
      assert(math.abs(n - ap) <= math.max(1.0, 0.05 * n),
        s"HLL drift: exact $n approx $ap")
    }
  }

  test("g6: funnel equals an in-memory event-walk per user") {
    val got = SparkEntry.queries("g6_funnel")(spark, sfDir)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSet
    assert(got.nonEmpty)
    val events = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"ts".cast("long"))
      .as[(Long, Long, String, Long)].collect()
    val want = events.groupBy(_._1).map { case (u, evs) =>
      // The independent formulation: a literal forward walk over the
      // (es, event_id)-sorted stream carrying the three best-so-far
      // stage times (not the window DP the operator uses).
      var tView, tClick, tPurchase = Option.empty[Long]
      for ((_, _, tpe, es) <- evs.sortBy(e => (e._4, e._2))) tpe match {
        case "view" if tView.forall(_ > es) => tView = Some(es)
        case "click" if tView.exists(_ < es) && tClick.isEmpty =>
          tClick = Some(es)
        case "purchase" if tClick.exists(_ < es) && tPurchase.isEmpty =>
          tPurchase = Some(es)
        case _ =>
      }
      val stage =
        if (tPurchase.nonEmpty) 3 else if (tClick.nonEmpty) 2
        else if (tView.nonEmpty) 1 else 0
      (u, tView, tClick, tPurchase, stage)
    }.toSet
    assert(got == want)
    assert(got.exists(_._5 == 3), "precondition: someone completes the funnel")
  }

  test("g6 plan: the three window passes and the per-user agg share ONE shuffle") {
    val p = SparkEntry.queries("g6_funnel")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1,
      s"g6 should shuffle exactly once on user_id\n$p")
  }

  test("g7: retention equals an in-memory cohort matrix; week 0 covers each cohort") {
    val got = SparkEntry.queries("g7_retention")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val events = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"ts".cast("long"))
      .as[(Long, String, Long)].collect()
    val cohort = events.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, evs) => u -> evs.map(_._3).min / 604800L }
    val want = events.flatMap { case (u, _, es) =>
      cohort.get(u).map(cw => (cw, es / 604800L - cw, u))
    }.filter(_._2 >= 0).distinct
      .groupBy(t => (t._1, t._2))
      .map { case ((cw, off), v) => (cw, off, v.map(_._3).distinct.length.toLong) }
      .toSet
    assert(got == want)
    // Every cohort's signup event itself counts as week-0 activity.
    val cohorts = got.map(_._1)
    assert(cohorts.forall(cw => got.exists(r => r._1 == cw && r._2 == 0L)))
  }

  test("g8: z-scores equal an in-memory trailing-stats recomputation") {
    val got = SparkEntry.queries("g8_anomaly_zscore")(spark, sfDir)
      .as[(String, Long, Long, Long, Option[Double], Int)].collect()
    assert(got.nonEmpty)
    val counts = got.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(r => (r._2, r._3))).toMap
    for ((tpe, rows) <- got.groupBy(_._1); r <- rows) {
      val series = counts(tpe)
      val idx = series.indexWhere(_._1 == r._2)
      val trail = series.slice(math.max(0, idx - 12), idx).map(_._2)
      assert(r._4 == trail.length.toLong, s"$tpe/${r._2}: n_prev")
      if (trail.length >= 8) {
        val n = trail.length.toDouble
        val mean = trail.sum / n
        val variance = (trail.map(c => c.toDouble * c).sum - trail.sum.toDouble *
          trail.sum / n) / (n - 1)
        if (variance > 0) {
          val z = (r._3 - mean) / math.sqrt(variance)
          assert(r._5.isDefined && math.abs(r._5.get - z) < 1e-5,
            s"$tpe/${r._2}: z ${r._5} want $z")
          assert(r._6 == (if (math.abs(r._5.get) > 3) 1 else 0))
        } else assert(r._5.isEmpty)
      } else assert(r._5.isEmpty && r._6 == 0, s"$tpe/${r._2}: short history")
    }
  }

  test("g8 plan: the z-score window runs on the aggregated frame after one agg shuffle") {
    // One exchange for the (window, type) count, one for the
    // per-type window pass over the tiny aggregated frame — the
    // event stream itself is never re-shuffled.
    val p = SparkEntry.queries("g8_anomaly_zscore")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size <= 2, s"g8 wants ≤ 2 shuffles\n$p")
  }
}
