package graft

import graft.functions.Text
import graft.operators.{Corpus, Similarity}
import org.apache.spark.sql.functions._

/** e8 kNN label propagation + f15 perplexity bucketing.
  *
  * The testdata labels are synthetic noise w.r.t. the embedding
  * geometry (measured ~chance accuracy), so there is deliberately NO
  * accuracy-floor assertion here — the operator contract is the vote
  * math and its composability over every kNN variant, and that is
  * what these specs pin.
  */
class ClassifyPerplexitySpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  // --- e8 classifyKnn ------------------------------------------------

  test("classifyKnn: weighted vote, rounded-weight argmax, label-asc tie-break") {
    // q1: label 1 wins on weight despite equal votes (0.9 > 0.8).
    // q2: exact weight tie after rounding -> smaller label wins.
    val knn = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.4), (1L, 20L, 0.8),
      (2L, 10L, 0.6), (2L, 20L, 0.6)
    ).toDF("query_id", "neighbor_id", "cosine")
    val labels = Seq((10L, 1), (11L, 1), (20L, 2))
      .toDF("vec_id", "label")
    val got = Similarity.classifyKnn(knn, labels, "vec_id", "label")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == Set((1L, 1, 2L, 0.9), (2L, 1, 1L, 0.6)))
  }

  test("classifyKnn composes over the ANN variants: one winner per query") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.knnBruteForce(queries, emb, "vec_id", "embedding", k = 10)
    val lsh = Similarity.knnLsh(queries, emb, "vec_id", "embedding", k = 10, dim = 64)
    val nQueries = queries.count()
    for (knn <- Seq(exact, lsh)) {
      val out = Similarity.classifyKnn(knn, emb, "vec_id", "label")
        .as[(Long, Int, Long, Double)].collect()
      assert(out.map(_._1).distinct.length == out.length, "one row per query")
      assert(out.length <= nQueries && out.nonEmpty)
      assert(out.forall(r => r._3 >= 1 && r._3 <= 10), "votes bounded by k")
    }
  }

  test("classifyKnn equals an in-memory recomputation of the vote from e1's rows") {
    val emb = Tables(spark, sfDir, "embeddings")
    val knn = Similarity.knnBruteForce(
      emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 10)
    val got = Similarity.classifyKnn(knn, emb, "vec_id", "label")
      .as[(Long, Int, Long, Double)].collect().toSet
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val rows = knn.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val want = rows.groupBy(_._1).map { case (q, nbrs) =>
      val byLabel = nbrs.groupBy(t => labels(t._2)).map { case (l, v) =>
        (l, v.length.toLong,
          BigDecimal(v.map(_._3).sum)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      val (l, votes, w) = byLabel.minBy { case (l, _, w) => (-w, l) }
      (q, l, votes, w)
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  // --- f15 perplexityBuckets -----------------------------------------

  test("perplexityBuckets equals an in-memory recomputation (model, nll, terciles)") {
    val docs = Tables(spark, sfDir, "documents")
    val got = Corpus.perplexityBuckets(docs, "doc_id", "text")
      .as[(Long, Long, Double, String)].collect().toSet
    assert(got.nonEmpty)
    val toks = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
    val counts = toks.flatMap(_._2).groupBy(identity).map { case (w, v) =>
      w -> v.length.toLong
    }
    val total = counts.values.sum.toDouble
    def r(v: Double, s: Int): Double =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      // Same fold as the engine: each token contributes its 9-dp
      // rounded ln(p); the sum of 9-dp multiples is order-free.
      val s = ts.map(w => r(math.log(counts(w) / total), 9)).sum
      (id, ts.length.toLong, r(-s / ts.length, 6))
    }
    // Spark Percentile's interpolation: lower + (higher-lower)*frac
    // at position p*(n-1) over the sorted values.
    val sorted = scored.map(_._3).sorted
    def pct(p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = sorted(pos.toInt)
      val hi = sorted(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val (t1, t2) = (pct(1d / 3), pct(2d / 3))
    val want = scored.map { case (id, n, nll) =>
      (id, n, nll,
        if (nll <= t1) "head" else if (nll <= t2) "middle" else "tail")
    }.toSet
    assert(got == want)
  }

  test("perplexityBuckets: terciles are balanced and zero-token docs drop") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Corpus.perplexityBuckets(docs, "doc_id", "text")
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("head", "middle", "tail"))
    val n = out.values.sum
    val nonEmptyDocs = docs
      .filter(size(Text.tokens(col("text"))) > 0).count()
    assert(n == nonEmptyDocs, "exactly the docs with >= 1 token are bucketed")
    // Interpolated-percentile cuts put each tercile within a couple of
    // rows of n/3 unless scores tie heavily at a threshold.
    assert(out.values.forall(c => math.abs(c - n / 3.0) <= n * 0.05 + 2),
      s"terciles skewed: $out")
  }

  // --- plan shapes ---------------------------------------------------

  test("f15 plan: no window operator anywhere — the tercile cut is a broadcast dim") {
    // The scale-killer this operator avoids is ntile() over the whole
    // corpus: ONE window partition = one task sorting everything.
    // The executed plan must contain no Window/WindowGroupLimit node
    // at all (the cut is two percentile AGGREGATES joined back as a
    // broadcast 1-row dim).
    val p = SparkEntry.queries("f15_perplexity_buckets")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"f15 must not use a window\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"threshold dim should broadcast\n$p")
  }

  test("e8 plan: the top-1 vote runs through the WindowGroupLimit pushdown") {
    val p = SparkEntry.queries("e8_knn_classify")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).nonEmpty,
      s"per-query argmax should push the group limit\n$p")
  }

  // --- the gate streams ---------------------------------------------

  test("qualityGate runs unchanged on a stream (zero-shuffle => streaming-safe)") {
    // The f13 gate is a pure map, so the SAME operator body is legal
    // in a streaming plan with no watermark and no output-mode
    // restriction — the property this spec pins (a shuffle or agg
    // sneaking into the gate would break this, not just slow it).
    // f15 deliberately has no streaming form: its thresholds are
    // corpus-global percentiles.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val gated = graft.operators.Corpus.qualityGate(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text")
    val q = gated.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      val longText = (1 to 60).map(i => s"tok$i").mkString(" ")
      input.addData((1L, longText), (2L, "too short"))
      q.processAllAvailable()
      val out = spark.table("gate_out")
        .select("id", "keep").as[(Long, Boolean)].collect().toMap
      assert(out(1L), "long clean doc passes the gate")
      assert(!out(2L), "short doc is rejected")
    } finally q.stop()
  }

  // --- e9 recallAt ---------------------------------------------------

  test("recallAt: literal overlap math, missed queries surface as zero") {
    // q1: 2 of 3 exact neighbors recovered; q2: ANN returned nothing.
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq((1L, 10L), (1L, 12L), (1L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAt(ann, exact)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 3L, 2L, 0.6667), (2L, 1L, 0L, 0.0)))
  }

  test("recallAt of an operator against itself is 1.0 for every query") {
    val emb = Tables(spark, sfDir, "embeddings")
    val exact = Similarity.knnBruteForce(
      emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 10)
    val got = Similarity.recallAt(exact, exact)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._2 == r._3 && r._4 == 1.0))
  }

  test("recallAt(LSH, exact) matches an in-memory set-overlap recomputation") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.knnBruteForce(queries, emb, "vec_id", "embedding", k = 10)
    val lsh = Similarity.knnLsh(queries, emb, "vec_id", "embedding", k = 10, dim = 64)
    val got = Similarity.recallAt(lsh, exact)
      .as[(Long, Long, Long, Double)].collect()
    val exSets = exact.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val anSets = lsh.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.length == exSets.size, "one row per exact-side query")
    got.foreach { case (q, nEx, nM, rec) =>
      val want = exSets(q).intersect(anSets.getOrElse(q, Set.empty)).size
      assert(nEx == exSets(q).size && nM == want)
      assert(math.abs(rec - want.toDouble / nEx) < 5e-5)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
