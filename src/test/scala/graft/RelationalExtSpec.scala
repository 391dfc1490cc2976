package graft

import graft.operators.{Relational, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Round-2 operator additions: as-of join, diversity-capped top-k,
  * IVF ANN recall, deterministic stratified sampling.
  */
class RelationalExtSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("asofJoin picks the latest right row at-or-before each left row") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0),
      (2L, 9L, 200.0)).toDF("k", "qts", "px")
    val out = Relational.asofJoin(trades, quotes, "k", "ts", "qts")
      .select($"trade", $"asof.px").as[(String, Option[Double])].collect().toMap
    assert(out("t1").contains(101.0), "equal timestamps match (inclusive)")
    assert(out("t2").contains(102.0))
    assert(out("t3").isEmpty, "no quote at-or-before ts=5")
  }

  test("asofJoin: null right keys/timestamps never match (no phantom head rows)") {
    // r12 review: a right row with a null ts (or key) sorted NULLS
    // FIRST to the partition head and became a running-last match for
    // left rows with no genuine predecessor. The contract is
    // null-false: such rows match nothing; a null LEFT ts row emits
    // with a null asof.
    val l = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L), "t1"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "tnull"))
      .toDF("k", "ts", "trade")
    val r = Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], 9.0),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L), 8.0))
      .toDF("k", "qts", "px")
    val out = Relational.asofJoin(l, r, "k", "ts", "qts")
      .select($"trade", $"asof.px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").isEmpty, "a null-ts quote must never match")
    assert(out("tnull").isEmpty, "a null-ts trade carries a null asof")
  }

  test("diffSnapshots fails loudly on a null snapshot key") {
    val cur = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("k", "v")
    val prev = Seq((java.lang.Long.valueOf(1L), "a")).toDF("k", "v")
    val e = intercept[Exception] {
      Relational.diffSnapshots(cur, prev, "k", col("v")).collect()
    }
    assert(e.getMessage != null)
    // And the non-null path is untouched.
    val ops = Relational.diffSnapshots(prev, prev, "k", col("v"))
      .select("op").as[String].collect().toSeq
    assert(ops == Seq("unchanged"))
  }

  test("diffSnapshotsCarry == diffSnapshots + rejoin; reserved names refused") {
    // The carry variant rides the diff's own full-outer join (one
    // snapshot shuffle instead of two) — its rows must equal the
    // compose-it-yourself form exactly, nulls on archive rows included.
    val cur = Seq((1L, "a", "pay1"), (2L, "b", "pay2"), (4L, "d", "pay4"))
      .toDF("k", "v", "payload")
    val prev = Seq((1L, "a"), (2L, "x"), (3L, "c")).toDF("k", "v")
    val got = Relational
      .diffSnapshotsCarry(cur, prev, "k", col("v"), Seq("payload"))
      .as[(Long, String, Option[String])].collect().toSet
    val want = Relational.diffSnapshots(cur, prev, "k", col("v"))
      .join(cur.select(col("k"), col("payload")), Seq("k"), "left")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == want)
    assert(got == Set((1L, "unchanged", Some("pay1")),
      (2L, "update", Some("pay2")), (3L, "archive", None),
      (4L, "insert", Some("pay4"))))
    // A carry name colliding with the diff's internals must be refused
    // loudly, not silently shadowed.
    val e = intercept[IllegalArgumentException] {
      Relational.diffSnapshotsCarry(
        cur.withColumnRenamed("payload", "cur_fp"), prev, "k", col("v"),
        Seq("cur_fp"))
    }
    assert(e.getMessage.contains("cur_fp"))
  }

  test("partialUpdateDocs refuses snapshots whose schemas drifted") {
    val cur = Seq((1L, "a", "s")).toDF("k", "v", "status")
    val prev = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Relational.partialUpdateDocs(cur, prev, "k")
    }
    assert(e.getMessage.contains("status"))
  }

  test("mixtureSample works when the caller's column is literally named 'domain'") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "domain")
    // r12 review: the rates dim previously also carried a column
    // named "domain" — AMBIGUOUS_REFERENCE on the most natural name.
    val out = Sampling.mixtureSample(df, col("doc_id"), col("domain"),
      Map("en" -> 0.5, "de" -> 0.5))
    assert(out.count() > 0 && out.columns.contains("domain"))
  }

  test("asofJoin resolves right-side ties by the largest tiebreak") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "name")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L)).toDF("k", "rts", "rid")
    val got = Relational.asofJoin(l, r, "k", "ts", "rts", rightTiebreak = Seq("rid"))
      .select($"asof.rid").as[Long].head()
    assert(got == 9L)
  }

  test("diverseTopK caps per-kind rows inside each group's top-k") {
    val df = Seq(
      // group 1: six rows, four of kind A with the best scores.
      (1L, "A", 100.0, 1L), (1L, "A", 90.0, 2L), (1L, "A", 80.0, 3L),
      (1L, "A", 70.0, 4L), (1L, "B", 60.0, 5L), (1L, "C", 50.0, 6L))
      .toDF("g", "kind", "score", "id")
    val got = Relational.diverseTopK(df, Seq($"g"), $"kind",
        Seq($"score".desc, $"id".asc), k = 3, perKind = 2)
      .select($"id").as[Long].collect().toSet
    // A's top-2 (ids 1,2) survive the cap; id 3,4 are cut; B (5) fills
    // the third slot.
    assert(got == Set(1L, 2L, 5L))
  }

  test("partialUpdateDocs emits exactly the changed fields, null-safe") {
    import graft.operators.Relational
    val prev = Seq(
      (1L, Some("a"), Some(10L)),   // unchanged
      (2L, Some("b"), Some(20L)),   // v changes
      (3L, Option.empty[String], Some(30L)), // s: null -> value
      (4L, Some("d"), Option.empty[Long]),   // s: value -> null, v: null -> value
      (5L, Some("e"), Some(50L)))   // archived (absent in cur)
      .toDF("k", "s", "v")
    val cur = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(21L)),
      (3L, Some("c"), Some(30L)),
      (4L, Option.empty[String], Some(40L)),
      (6L, Some("f"), Some(60L)))   // inserted (absent in prev)
      .toDF("k", "s", "v")
    val got = Relational.partialUpdateDocs(cur, prev, "k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(got === Set(
      (2L, "v", Some("21")),
      (3L, "s", Some("c")),
      (4L, "s", None),          // value -> null still emits the field
      (4L, "v", Some("40"))))
  }

  test("ivf knn achieves reasonable recall vs exact knn") {
    val emb = Tables(spark, sfDir, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.knnBruteForce(qs, emb, "vec_id", "embedding", 10))
    val approx = topSets(Similarity.knnIvf(qs, emb, "vec_id", "embedding", 10))
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
    val mean = recalls.sum / recalls.size
    // 0.52 without refinement, 0.66 with the default 2 Lloyd iters.
    assert(mean >= 0.5, s"mean recall@10 = $mean")

    // Sampled Lloyd fit (the >10^8-doc path: refine centroids on half
    // the corpus, assign everything) must not collapse recall — the
    // fit needs a representative sample, not every vector.
    val sampled = topSets(Similarity.knnIvf(qs, emb, "vec_id", "embedding", 10,
      fitKeep = 50))
    val sRecalls = exact.map { case (q, t) =>
      sampled.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
    val sMean = sRecalls.sum / sRecalls.size
    assert(sMean >= 0.45, s"sampled-fit mean recall@10 = $sMean")

    // IVF+PQ (lists carry codes, ADC shortlist, exact rescore) may
    // lose only what the shortlist cut costs on top of the coarse
    // stage — measured 0.66 vs 0.66 here, 0.55 vs 0.56 at sf0.01.
    val pq = topSets(Similarity.knnIvfPq(qs, emb, "vec_id", "embedding", 10,
      dim = 64))
    val pqRecalls = exact.map { case (q, t) =>
      pq.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
    val pqMean = pqRecalls.sum / pqRecalls.size
    assert(pqMean >= mean - 0.1,
      s"ivf+pq recall@10 = $pqMean collapsed vs plain ivf $mean")
    assert(pqMean >= 0.5, s"ivf+pq mean recall@10 = $pqMean")
  }

  test("overlapPairs array and join paths agree, with and without a df cap") {
    // Element e1 is shared by 1,2,3; e2 by 2,3; e3 by 1..5 (df 5).
    val edges = (Seq((1L, "e1"), (2L, "e1"), (3L, "e1"), (2L, "e2"), (3L, "e2")) ++
      (1L to 5L).map(i => (i, "e3"))).toDF("id", "el")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    // boundedDf picks the array path; default the join path — same result.
    assert(norm(Relational.overlapPairs(edges, "id", "el", boundedDf = true)) ===
      norm(Relational.overlapPairs(edges, "id", "el")))
    // dfCap = 4 must drop e3 entirely on both paths: capped result =
    // join-path result of the manually filtered edge set.
    val manual = Relational.overlapPairs(edges.filter($"el" =!= "e3"), "id", "el")
    assert(norm(Relational.overlapPairs(edges, "id", "el", dfCap = 4)) === norm(manual))
    assert(norm(manual) === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("property: asofJoin matches an in-memory oracle on random events") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // Random left probes and right updates over a few keys; ts
      // collisions (incl. right-right at equal ts) happen on purpose.
      val lefts = (1 to 40).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, i.toLong))
      val rights = (1 to 25).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, i.toLong * 100))
      val want = lefts.map { case (k, ts, id) =>
        // Latest right at-or-before; ties broken by the largest rv.
        val cands = rights.filter(r => r._1 == k && r._2 <= ts)
        val best = if (cands.isEmpty) None
          else Some(cands.maxBy(r => (r._2, r._3))._3)
        (id, best)
      }.toMap
      val got = Relational.asofJoin(
          lefts.toDF("k", "ts", "lid"), rights.toDF("k", "ts", "rv"),
          key = "k", leftTs = "ts", rightTs = "ts", rightTiebreak = Seq("rv"))
        .selectExpr("lid", "asof.rv AS rv")
        .as[(Long, Option[Long])].collect().toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("property: diverseTopK matches an in-memory oracle on random rows") {
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 5) {
      val rows = (1 to 60).map(i =>
        (rnd.nextInt(3).toLong, s"kind${rnd.nextInt(4)}",
          rnd.nextInt(30).toDouble, i.toLong))
      val (k, perKind) = (4, 2)
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        // Walk score-desc (id-asc ties); admit while the row's kind
        // has quota and the group has room.
        val quota = scala.collection.mutable.Map.empty[String, Int]
        grp.sortBy(r => (-r._3, r._4)).iterator
          .filter { r =>
            val used = quota.getOrElse(r._2, 0)
            used < perKind && { quota(r._2) = used + 1; true }
          }
          // NOTE: quota consumed only by ADMITTED rows — matches the
          // operator's two-window (per-kind rank then global rank)
          // semantics because per-kind rank is computed first.
          .take(k).map(_._4).toList
      }.toSet
      val got = Relational.diverseTopK(
          rows.toDF("g", "kind", "score", "id"),
          Seq(col("g")), col("kind"),
          Seq(col("score").desc, col("id").asc), k = k, perKind = perKind)
        .select("id").as[Long].collect().toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("property: rangeJoin matches the naive between-join on random intervals") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 5) {
      // Each row also carries a scope key so eqKeys is exercised:
      // pairs must share the key AND overlap on the value axis.
      val points = (1 to 50).map(i =>
        (i.toLong, rnd.nextInt(200).toLong, rnd.nextInt(3).toLong))
      val intervals = (1 to 20).map { i =>
        val s = rnd.nextInt(200).toLong
        (i.toLong + 1000, s, s + rnd.nextInt(40).toLong, rnd.nextInt(3).toLong)
      }
      val want = (for {
        (pid, v, pk) <- points
        (iid, s, e, ik) <- intervals
        if pk == ik && v >= s && v <= e
      } yield (pid, iid)).toSet
      for (bucketSize <- Seq(1L, 7L, 64L, 1000L)) {
        val got = Relational.rangeJoin(
            points.toDF("pid", "v", "k"), intervals.toDF("iid", "s", "e", "k"),
            pointCol = "v", startCol = "s", endCol = "e",
            bucketSize = bucketSize, eqKeys = Seq("k"))
          .select("pid", "iid").as[(Long, Long)].collect()
        assert(got.length === got.distinct.length,
          s"trial $trial bucket $bucketSize: duplicate pairs")
        assert(got.toSet === want, s"trial $trial bucket $bucketSize")
      }
    }
  }

  test("rangeJoin plans as an equi-join, not a nested loop") {
    val points = spark.range(100).selectExpr("id AS pid", "id * 3 AS v")
    val intervals = spark.range(30)
      .selectExpr("id AS iid", "id * 10 AS s", "id * 10 + 15 AS e")
    val plan = Relational.rangeJoin(points, intervals,
      "v", "s", "e", bucketSize = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must bucket into an equi-join\n$plan")
    // Negative-valued axes bucket correctly too (floor, not int-div).
    val negP = Seq((1L, -7L)).toDF("pid", "v")
    val negI = Seq((9L, -10L, -5L)).toDF("iid", "s", "e")
    val hit = Relational.rangeJoin(negP, negI, "v", "s", "e", bucketSize = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(hit === Set((1L, 9L)))
    // A sentinel open-ended interval fails loudly instead of letting
    // sequence() attempt a billion-element bucket array.
    val openI = Seq((7L, 0L, Long.MaxValue / 2)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      Relational.rangeJoin(negP, openI, "v", "s", "e", bucketSize = 4).count()
    }
    assert(ex.getMessage != null)
  }

  test("rangeJoin buckets exactly beyond 2^53 (no double rounding)") {
    // Nanosecond-epoch-sized longs: a double cast rounds these, so the
    // ADVICE r3 fix computes integral buckets with exact long
    // arithmetic. Points sit at exact bucket boundaries around 2^60
    // where double rounding is coarsest (spacing 128 at this
    // magnitude); the matched set must be exact, joined on exact
    // bucket ids, and the exact BETWEEN filter must keep/drop
    // off-by-one values correctly.
    val base = 1L << 60
    val pts = Seq((1L, base), (2L, base + 1), (3L, base + 999),
      (4L, base + 1000), (5L, base - 1)).toDF("pid", "v")
    val ivals = Seq((10L, base, base + 999)).toDF("iid", "s", "e")
    for (bucketSize <- Seq(3L, 1000L, 4096L)) {
      val got = Relational.rangeJoin(pts, ivals, "v", "s", "e", bucketSize)
        .select("pid").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 3L), s"bucketSize $bucketSize")
    }
  }

  test("property: overlapPairs paths match an in-memory oracle on random edge sets") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(12).toLong, s"e${rnd.nextInt(8)}")).distinct
      val cap = 1 + rnd.nextInt(6)
      // Oracle: count shared elements per ordered pair, with and
      // without the df cut, straight from the in-memory set.
      def oracle(capped: Boolean): Map[(Long, Long), Long] = {
        val kept = if (!capped) edges else {
          val df = edges.groupBy(_._2).view.mapValues(_.size).toMap
          edges.filter(e => df(e._2) <= cap)
        }
        kept.groupBy(_._2).values.flatMap { grp =>
          val ids = grp.map(_._1).sorted
          for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
        }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      }
      def run(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
        df.as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val in = edges.toDF("id", "el")
      assert(run(Relational.overlapPairs(in, "id", "el")) === oracle(false),
        s"trial $trial join path")
      assert(run(Relational.overlapPairs(in, "id", "el", boundedDf = true)) ===
        oracle(false), s"trial $trial array path")
      assert(run(Relational.overlapPairs(in, "id", "el", dfCap = cap)) ===
        oracle(true), s"trial $trial capped join path (cap=$cap)")
      assert(run(Relational.overlapPairs(in, "id", "el", dfCap = cap,
        boundedDf = true)) === oracle(true), s"trial $trial capped array path (cap=$cap)")
    }
  }

  test("saltedJoin equals the plain inner join on skewed keys") {
    // 10k rows of one hot key + a spread tail, joined to a small dim.
    val probe = spark.range(10000).select(
      when($"id" < 9000, lit(7L)).otherwise($"id" % 50).as("k"), $"id".as("payload"))
    val build = Seq((7L, "hot"), (3L, "cold"), (11L, "cool")).toDF("k", "attr")
    val expected = probe.join(build, "k")
      .select($"k", $"payload", $"attr").as[(Long, Long, String)].collect().toSet
    val salted = Relational.saltedJoin(probe, build, "k", saltFactor = 8)
      .select($"k", $"payload", $"attr").as[(Long, Long, String)].collect().toSet
    assert(salted == expected)
  }

  test("property: applySnapshotOps round-trips diffSnapshots on random snapshots") {
    // apply(prev, cur, diff(cur, prev)) == cur, exactly — for any pair
    // of states, including disjoint, identical, and fp-flip cases.
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(400 + seed)
      // Null fingerprints included: a present row with a NULL fp must
      // round-trip too (regression: fp-nullness once masqueraded as
      // row absence and 'archived' live rows).
      def snap() = (0 until rnd.nextInt(40) + 1)
        .map(_ => (rnd.nextInt(25).toLong,
          if (rnd.nextInt(5) == 0) Option.empty[Long] else Some(rnd.nextInt(4).toLong)))
        .distinctBy(_._1)
      val prevRows = snap(); val curRows = snap()
      val prev = prevRows.toDF("k", "fp")
      val cur = curRows.toDF("k", "fp")
      val ops = Relational.diffSnapshots(cur, prev, "k", col("fp"))
      val got = Relational.applySnapshotOps(prev, cur, ops, "k")
        .as[(Long, Option[Long])].collect().toSet
      assert(got == curRows.toSet, s"seed=$seed: got $got want ${curRows.toSet}")
    }
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val docs = Tables(spark, sfDir, "documents")
    val a = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 50), 20).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs.repartition(7), col("doc_id"), col("lang"),
      Map("en" -> 50), 20).select("doc_id").as[Long].collect().toSet
    assert(a == b, "same sample regardless of partitioning")
    // Rate sanity on the biggest stratum: en keep-rate near 50%.
    val en = docs.filter(col("lang") === "en")
    val kept = Sampling.stratifiedSample(en, col("doc_id"), col("lang"),
      Map("en" -> 50), 20).count().toDouble / en.count()
    assert(kept > 0.3 && kept < 0.7, s"en keep rate $kept")
  }

  test("mixture sample: binding domain kept whole, shares track targets, unlisted drop") {
    // Weights deliberately over-demand 'de' (scarce relative to 0.4),
    // so de binds: T = n_de/0.4, de keeps ~everything, en rates down.
    val docs = Tables(spark, sfDir, "documents")
    val w = Map("en" -> 0.4, "de" -> 0.4, "fr" -> 0.2)
    val out = Sampling.mixtureSample(docs, col("doc_id"), col("lang"), w)
    val got = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(!got.contains("zh") && !got.contains("es"), "unlisted domains drop")
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val bind = w.keys.minBy(d => n(d) / w(d))
    // The binding domain's keep rate is floor-quantized 1.0 — at most
    // a handful of rows short of whole.
    assert(got(bind) >= n(bind) - (n(bind) / 1000 + 1).toInt,
      s"binding domain $bind: kept ${got(bind)} of ${n(bind)}")
    // Every kept share matches the target proportion of the feasible
    // total within hash noise (small strata at sf0.001 → wide band).
    val t = w.keys.map(d => n(d) / w(d)).min
    for ((d, wd) <- w) {
      val want = wd * t
      assert(math.abs(got(d) - want) <= math.max(6.0, 0.35 * want),
        s"$d: kept ${got(d)}, target $want of feasible total $t")
    }
  }

  test("mixture sample is deterministic under repartitioning and a subset of input") {
    val docs = Tables(spark, sfDir, "documents")
    val w = Map("en" -> 0.5, "fr" -> 0.5)
    val a = Sampling.mixtureSample(docs, col("doc_id"), col("lang"), w)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(docs.repartition(7), col("doc_id"), col("lang"), w)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same sample regardless of partitioning")
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(all) && a.nonEmpty)
  }
}
