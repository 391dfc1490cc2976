package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-4 corpus operators (f8 TF-IDF,
  * f9 chunking, f10 repetition signals, d9 decontamination) beyond
  * the driver's DuckDB oracle gate: invariants that must hold on any
  * input, checked on sf0.001.
  */
class CorpusOpsSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("f8: at most 3 terms per doc, scores non-increasing in rank") {
    val out = SparkEntry.queries("f8_tfidf")(spark, sfDir).cache()
    try {
      val over = out.groupBy("doc_id").count().filter($"count" > 3).count()
      assert(over == 0, "more than k terms for some doc")
      // rank 1's score >= rank 2's >= rank 3's within every doc
      val bad = out.as[(Long, String, Long, Double, Int)]
        .groupByKey(_._1).flatMapGroups { (_, rows) =>
          val sorted = rows.toSeq.sortBy(_._5)
          if (sorted.sliding(2).exists { case Seq(a, b) => a._4 < b._4; case _ => false })
            Iterator(1) else Iterator.empty
        }.count()
      assert(bad == 0, "score increased with rank inside a doc")
    } finally out.unpersist()
  }

  test("f8: a corpus-ubiquitous term never outranks a distinctive one") {
    // Every doc contains filler word 'a' (df = N → idf = 0); any term
    // with df < N and tf >= 1 scores strictly higher.
    val out = SparkEntry.queries("f8_tfidf")(spark, sfDir)
    val zeroScoreRanked1 = out.filter($"rn" === 1 && $"score" <= 0.0).count()
    // rank-1 term can only score 0 if EVERY term of the doc is ubiquitous
    // — possible for degenerate docs, but then all its scores are 0.
    val contradiction = out.filter($"rn" === 1 && $"score" <= 0.0)
      .join(out.filter($"score" > 0.0).select($"doc_id").distinct(), "doc_id")
      .count()
    assert(contradiction == 0,
      s"a zero-idf term ranked first over a positive-score term ($zeroScoreRanked1 rank-1 zeros)")
  }

  test("f9: chunks tile the token array — sizes and coverage") {
    val out = SparkEntry.queries("f9_chunk_windows")(spark, sfDir).cache()
    try {
      // every chunk holds 1..50 tokens
      assert(out.filter($"chunk_tokens" < 1 || $"chunk_tokens" > 50).count() == 0)
      // chunk indexes are dense 0..k-1 per doc
      val dense = out.groupBy("doc_id")
        .agg(count(lit(1)).as("k"), max($"chunk_idx").as("mx"), min($"chunk_idx").as("mn"))
        .filter($"mn" =!= 0 || $"mx" =!= $"k" - 1).count()
      assert(dense == 0, "chunk_idx not dense from 0")
      // exact size law: chunk i holds min(50, n - 40*i) tokens, and
      // every tokenized doc appears with ceil(n/40)-ish chunk count
      // (floor((n-1)/40) + 1)
      val toks = Tables(spark, sfDir, "documents")
        .select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
        .select($"doc_id", size($"toks").cast("long").as("n"))
        .filter($"n" > 0)
      val bad = out.join(toks, "doc_id")
        .filter($"chunk_tokens" =!= least(lit(50L), $"n" - lit(40L) * $"chunk_idx"))
        .count()
      assert(bad == 0, "chunk size law broken")
      val kBad = out.groupBy("doc_id").agg(count(lit(1)).as("k"))
        .join(toks, "doc_id")
        .filter($"k" =!= expr("(n - 1) DIV 40 + 1")).count()
      assert(kBad == 0, "chunk count law broken")
    } finally out.unpersist()
  }

  test("f12: packing laws — offsets are a prefix sum, seq ownership by start offset") {
    import graft.operators.Corpus
    val chunks = Seq(
      // group A: tokens 5,7,3,10 -> offsets 0,5,12,15; budget 8 ->
      // seq ids 0,0,1,1 (the 7-chunk straddles 8, start-offset owns)
      ("A", 1L, 5L), ("A", 2L, 7L), ("A", 3L, 3L), ("A", 4L, 10L),
      // group B independent: offsets restart at 0
      ("B", 1L, 9L), ("B", 2L, 1L))
      .toDF("grp", "ord", "chunk_tokens")
    val got = Corpus.packSequences(chunks, Seq($"grp"), Seq($"ord"),
        $"chunk_tokens", budget = 8L)
      .select($"grp", $"ord", $"seq_offset", $"seq_id")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 1L, 0L, 0L), ("A", 2L, 5L, 0L), ("A", 3L, 12L, 1L), ("A", 4L, 15L, 1L),
      ("B", 1L, 0L, 0L), ("B", 2L, 9L, 1L)))
    // Conservation on real chunks: packed token sums equal chunk totals.
    val docs = Tables(spark, sfDir, "documents")
    val real = Corpus.chunkWindows(docs, "doc_id", "text", 50, 40)
    val packed = Corpus.packSequences(real, Seq(lit(1)), Seq($"id", $"chunk_idx"),
      $"chunk_tokens", budget = 256L)
    assert(packed.agg(sum($"chunk_tokens")).as[Long].head() ===
      real.agg(sum($"chunk_tokens")).as[Long].head())
    // Every sequence but the last starts within budget of its id.
    val bad = packed.filter($"seq_offset" - $"seq_id" * 256 >= 256).count()
    assert(bad === 0)
  }

  test("packSequences: orderCols TIES still pack disjoint offsets (ROWS frame)") {
    import graft.operators.Corpus
    // r12 review: the default RANGE frame handed every tie the same
    // INCLUSIVE sum — two tied 10-token chunks both read offset 10,
    // overlapping one sequence and leaving another empty. Under the
    // explicit ROWS frame the offsets are the exact disjoint prefix
    // sums; tie ORDER is engine-chosen, so assert the offset SET.
    val chunks = Seq(("A", 1L, 10L), ("A", 1L, 10L), ("A", 1L, 10L))
      .toDF("grp", "ord", "chunk_tokens")
    val got = Corpus.packSequences(chunks, Seq($"grp"), Seq($"ord"),
        $"chunk_tokens", budget = 8L)
      .select($"seq_offset").as[Long].collect().toSet
    assert(got === Set(0L, 10L, 20L), s"got $got")
  }

  test("contamination: a null isBench predicate lands the doc in the corpus branch") {
    import graft.operators.Corpus
    // r12 review: null failed BOTH branch filters and the doc
    // silently vanished; the contract promises a row for every
    // non-benchmark document.
    val docs = Seq((java.lang.Long.valueOf(1L), "alpha beta gamma delta"),
      (null.asInstanceOf[java.lang.Long], "alpha beta gamma delta"),
      (java.lang.Long.valueOf(20L), "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Corpus.contamination(docs, "doc_id", "text", n = 3,
      isBench = $"doc_id" % 20 === 0)
    // doc 20 is bench; doc 1 AND the null-id doc are corpus rows.
    assert(out.count() == 2, s"got ${out.collect().mkString(", ")}")
    assert(out.filter($"id".isNull).count() == 1,
      "the null-predicate doc must keep its output row")
  }

  test("f10: fractions bounded; a constant-text doc maxes out") {
    val out = SparkEntry.queries("f10_repetition")(spark, sfDir)
    val bad = out.filter(
      $"dup_token_frac" < 0 || $"dup_token_frac" >= 1 ||
      $"top2gram_frac" < 0 || $"top2gram_frac" > 1 ||
      $"top3gram_frac" < 0 || $"top3gram_frac" > 1).count()
    assert(bad == 0)
    // direct unit check on crafted docs through the same query shape:
    // "x x x x x" is pure repetition (top2 frac 1.0, dup frac 0.8);
    // all-distinct text has dup frac 0 and bigram frac 1/(n-1)
    val docs = Seq((1L, "x x x x x"), (2L, "a b c d e")).toDF("doc_id", "text")
    val toks = docs.select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
    val g2 = toks.select($"doc_id", explode(graft.functions.Text.shingles($"toks", 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg((max($"c").cast("double") / sum($"c")).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(g2(1L) == 1.0 && math.abs(g2(2L) - 0.25) < 1e-9)
  }

  test("f11: entropy bounded by ln(alphabet); constant text scores zero") {
    val out = SparkEntry.queries("f11_char_entropy")(spark, sfDir)
    // 0 <= H <= ln(distinct chars), with slack for float round-off
    val bad = out.filter($"char_entropy" < -1e-6 ||
      $"char_entropy" > log($"n_distinct_chars".cast("double")) + 1e-6).count()
    assert(bad == 0, "entropy outside [0, ln |alphabet|]")
    // direct unit values through the same query shape
    val docs = Seq((1L, "aaaa"), (2L, "ab")).toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .filter(length($"ch") > 0)
      .groupBy("doc_id", "ch").agg(count(lit(1)).cast("double").as("c"))
      .groupBy("doc_id")
      .agg((log(sum($"c")) - sum($"c" * log($"c")) / sum($"c")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L)) < 1e-12, s"constant text must score 0, got ${got(1L)}")
    assert(math.abs(got(2L) - math.log(2)) < 1e-12,
      s"two equiprobable chars must score ln 2, got ${got(2L)}")
  }

  test("WordShingles: native codegen shingling matches the HOF formulation exactly") {
    import graft.functions.Text
    // Random token arrays including null arrays, null elements, empty
    // arrays and arrays shorter than n — the full contract surface.
    val rnd = new scala.util.Random(500)
    val rows: Seq[Option[Seq[Option[String]]]] = (0 until 300).map { _ =>
      if (rnd.nextInt(10) == 0) None
      else Some((0 until rnd.nextInt(8)).map { _ =>
        if (rnd.nextInt(12) == 0) Option.empty[String]
        else Some(s"t${rnd.nextInt(5)}")
      })
    }
    // repartition blocks ConvertToLocalRelation from constant-folding
    // the projection at optimize time (which would run interpreted
    // eval and collapse to a LocalTableScan — making both the parity
    // run and any plan assertion vacuous), and fallback=false turns a
    // broken doGenCode into a hard failure instead of a silent
    // interpreted fallback.
    val df = rows.toDF("toks").repartition(3)
    val c = spark.conf
    val savedFallback = c.getOption("spark.sql.codegen.fallback")
    try {
      c.set("spark.sql.codegen.fallback", "false")
      for (n <- 1 to 4) {
        val got = df.select(Text.shingles($"toks", n).as("s"))
          .as[Seq[String]].collect().toSeq
        val want = df.select(Text.shinglesHof($"toks", n).as("s"))
          .as[Seq[String]].collect().toSeq
        assert(got == want, s"n=$n: native and HOF shingles diverge")
      }
      val plan = df.select(Text.shingles($"toks", 3).as("s")).queryExecution
        .executedPlan.toString
      assert(plan.contains("graft_shingles") && plan.contains("Project"),
        s"native expression must survive into a projected plan\n$plan")
    } finally savedFallback.fold(c.unset("spark.sql.codegen.fallback"))(
      c.set("spark.sql.codegen.fallback", _))
  }

  test("d10: planted cross-doc span flagged, unique text scores zero") {
    import graft.operators.Corpus
    // doc 1 and 2 share the span "p q r" (one 3-gram); doc 3 is all
    // unique; doc 4 repeats its own gram twice (within-doc dup counts).
    val docs = Seq(
      (1L, "a b p q r c d"), (2L, "x y p q r z w"),
      (3L, "k l m n o"), (4L, "s t u s t u")).toDF("doc_id", "text")
    val out = Corpus.dupSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((5L, 1L)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((5L, 1L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((3L, 0L)), s"unique doc must score 0: ${out(3L)}")
    // "s t u s t u": grams = [stu, tus, ust, stu] → "s t u" twice
    assert(out(4L) == ((4L, 2L)), s"within-doc repeat: ${out(4L)}")
  }

  test("p2: every pipeline gate provably held on the output") {
    val out = SparkEntry.queries("p2_corpus_pipeline")(spark, sfDir).cache()
    try {
      assert(out.count() > 0, "pipeline must keep some documents")
      // benchmark docs never survive
      assert(out.filter($"doc_id" % 20 === 0).count() == 0)
      // the sample cut held (md5-bucket < 50 for en)
      assert(out.filter(
        graft.operators.Sampling.hashBucket($"doc_id") >= 50).count() == 0)
      // token floor and the chunk law, both against INDEPENDENTLY
      // re-tokenized counts (asserting n_chunks from the output's own
      // n_tokens would be a tautology — any tokenizer bug upstream
      // would pass it by construction)
      val fresh = Tables(spark, sfDir, "documents")
        .select($"doc_id",
          size(graft.functions.Text.tokens($"text")).cast("long").as("m"))
      val j = out.join(fresh, "doc_id").cache()
      try {
        assert(j.count() == out.count(), "output doc missing from source")
        assert(j.filter($"n_tokens" =!= $"m").count() == 0,
          "pipeline n_tokens drifted from a fresh tokenization")
        assert(j.filter($"m" < 10).count() == 0)
        assert(j.filter($"n_chunks" =!= expr("(m - 1) DIV 40 + 1")).count() == 0)
      } finally j.unpersist()
      // no kept doc is a near-dup loser: any two kept docs with equal
      // text would be an uncollapsed exact-dup cluster
      val texts = out.join(Tables(spark, sfDir, "documents"), "doc_id")
        .groupBy(md5($"text")).count().filter($"count" > 1).count()
      assert(texts == 0, "exact duplicates survived the cluster cut")
    } finally out.unpersist()
  }

  test("d9: benchmark docs excluded; hits bounded by shingles; a planted copy is flagged") {
    val out = SparkEntry.queries("d9_decontaminate")(spark, sfDir).cache()
    try {
      assert(out.filter($"doc_id" % 20 === 0).count() == 0, "benchmark doc in output")
      assert(out.filter($"n_hits" > $"n_shingles" || $"n_hits" < 0).count() == 0)
      assert(out.filter($"contamination" < 0 || $"contamination" > 1).count() == 0)
      // exact duplicates of a benchmark doc must be fully contaminated:
      // doc texts repeat in this corpus (d1 finds exact groups), so any
      // non-benchmark doc sharing a benchmark doc's full text has
      // contamination 1.0
      val docs = Tables(spark, sfDir, "documents").select($"doc_id", md5($"text").as("h"))
      val benchHashes = docs.filter($"doc_id" % 20 === 0).select($"h").distinct()
      val copies = docs.filter($"doc_id" % 20 =!= 0)
        .join(benchHashes, "h").select($"doc_id")
      val nCopies = copies.count()
      val flagged = out.join(copies, "doc_id").filter($"contamination" === 1.0).count()
      assert(flagged == nCopies,
        s"$nCopies exact benchmark copies but only $flagged fully flagged")
    } finally out.unpersist()
  }

  // --- f21 feature hashing -------------------------------------------

  test("f21: vectors equal a plain-Scala replay of the one-digest scheme") {
    val dim = 8
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta beta"),
      (3L, ""),                      // no tokens → zero vector
      (4L, null.asInstanceOf[String]), // null text → zero vector
      (5L, "alpha")
    ).toDF("doc_id", "text")
    def cell(tok: String): (Int, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"htf:$tok".getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.wrap(d)
      val pos = ((bb.getInt(0) & 0xFFFFFFFFL) % dim).toInt
      val sgn = if ((bb.getInt(4) & 1) == 0) 1L else -1L
      (pos, sgn)
    }
    def expect(text: String): Array[Long] = {
      val v = new Array[Long](dim)
      for (t <- Option(text).getOrElse("").split("\\s+") if t.nonEmpty) {
        val (p, s) = cell(t); v(p) += s
      }
      v
    }
    val got = graft.operators.Corpus
      .hashVectorize(docs, "doc_id", "text", dim)
      .as[(Long, Array[Long], Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L), "all docs survive")
    for ((id, vec, n) <- got) {
      val text = Seq("alpha beta alpha gamma", "beta beta beta", "", null,
        "alpha")(id.toInt - 1)
      assert(vec.toSeq == expect(text).toSeq, s"doc $id vector")
      assert(n == Option(text).getOrElse("").split("\\s+").count(_.nonEmpty),
        s"doc $id n_tokens")
      assert(vec.length == dim)
      // signed counts can cancel, but total mass never exceeds tokens
      assert(vec.map(math.abs).sum <= n || n == 0, s"doc $id mass")
    }
  }

  test("f21: dim bounds are enforced") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.hashVectorize(docs, "doc_id", "text", dim = 1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.hashVectorize(docs, "doc_id", "text",
        dim = (1 << 20) + 1)
    }
  }

  test("dupSpansAgainst equals the full dupSpans restricted to the slice") {
    // The d17 contract on real documents: incremental measurement
    // against the persisted gram dim ≡ full recompute over
    // corpus ∪ slice, restricted to slice docs.
    import graft.operators.Corpus
    val docs = Tables(spark, sfDir, "documents")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"n_grams", $"n_dup", $"dup_fraction")
        .as[(Long, Long, Long, Double)].collect().toSet
    val got = rows(Corpus.dupSpansAgainst(
      Corpus.gramCounts(existing, "text", n = 3),
      incoming, "doc_id", "text", n = 3))
    val want = rows(Corpus.dupSpans(docs, "doc_id", "text", n = 3)
      .filter($"id" % 10 === 0))
    assert(got.nonEmpty && got == want)
  }

  test("dupSpanCutAgainst equals the full dupSpanCut restricted to the slice") {
    import graft.operators.Corpus
    val docs = Tables(spark, sfDir, "documents")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"n_tokens", $"n_kept", $"kept_hash")
        .as[(Long, Long, Long, String)].collect().toSet
    val got = rows(Corpus.dupSpanCutAgainst(
      Corpus.gramCounts(existing, "text", n = 3),
      incoming, "doc_id", "text", n = 3))
    val want = rows(Corpus.dupSpanCut(docs, "doc_id", "text", n = 3)
      .filter($"id" % 10 === 0))
    assert(got.nonEmpty && got == want)
  }

  test("perplexityBucketsWith keeps all-out-of-vocabulary docs as NULL-bucket rows") {
    import graft.operators.Corpus
    // Model fit on English-ish docs; doc 3 shares no token with the
    // model — it must keep its row (n_tokens 0, NULL nll/bucket), not
    // vanish and silently shrink the tercile population.
    val modelDocs = Seq((1L, "the cat sat"), (2L, "the dog ran"))
      .toDF("doc_id", "text")
    val scoreDocs = modelDocs.unionByName(
      Seq((3L, "zxq wvut ponm")).toDF("doc_id", "text"))
    val out = Corpus.perplexityBucketsWith(
        Corpus.unigramFit(modelDocs, "doc_id", "text"),
        scoreDocs, "doc_id", "text")
      .select($"id", $"n_tokens", $"nll".isNull, $"bucket".isNull)
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map { case (id, n, a, b) => id -> ((n, a, b)) }.toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L) == ((0L, true, true)), s"OOV doc row: ${out(3L)}")
    assert(!out(1L)._2 && !out(1L)._3, "modeled docs keep real scores")
  }

  test("tokenizer whitespace class is explicit and dialect-proof (the VT divergence)") {
    // Java's \s includes VERTICAL TAB (\x0B); DuckDB's RE2 \s does
    // not — with '\s+' on both sides, "a\x0Bb" tokenized to [a, b] on
    // the engine and ONE token in the oracle, a silent divergence on
    // real web text the VT-free testdata can never surface (r13
    // review, measured live on both engines). The class is therefore
    // spelled out on both sides; these pins keep it that way.
    // Engine behavior: every Java-\s character still splits —
    // including VT — and non-\s unicode spaces (NBSP) do not.
    val toks = Seq("a\u000Bb c\td\ne\ff\rg", "x\u00A0y")
      .toDF("text")
      .select(graft.functions.Text.tokens($"text").as("t"))
      .as[Seq[String]].collect()
    assert(toks(0) == Seq("a", "b", "c", "d", "e", "f", "g"),
      s"VT/TAB/LF/FF/CR must all split: ${toks(0)}")
    assert(toks(1) == Seq("x\u00A0y"), "NBSP is not whitespace on either engine")
    // Oracle drift guards: the shared tokenizer fragment carries the
    // explicit class, and NO registered oracle leans on bare \s (a
    // future oracle that needs it must confront the dialect question
    // this test documents).
    assert(graft.queries.DuckSql.toks.contains("\\x0B") &&
      !graft.queries.DuckSql.toks.contains("\\s"))
    val offenders = SparkEntry.oracleSql.filter(_._2.contains("\\s")).keys
    assert(offenders.isEmpty,
      s"oracles using dialect-dependent \\s: ${offenders.mkString(", ")}")
    // The sibling dialect trap, same treatment (a11's range-suffix
    // anchor): Java's `$` also matches BEFORE a trailing line
    // terminator, RE2's does not — both agree on `\z`, so a
    // trailing-newline name is consistently NOT ranged on either
    // engine. Pin the engine behavior on both inputs.
    val anch = Seq("Foo: A", "Foo: A\n").toDF("name")
      .select($"name", $"name".rlike(": [A-Z]\\z").as("ranged"))
      .as[(String, Boolean)].collect().toMap
    assert(anch("Foo: A") && !anch("Foo: A\n"),
      s"\\z must anchor at the absolute end on the engine: $anch")
    // Unicode case mapping, the DECLARED residual of this dialect
    // class (measured r13): Spark agrees with the reference's Python
    // — lower('İ') = "i" + U+0307 (combining dot), upper('ß') = "SS"
    // — while DuckDB maps them 1:1 ('i', U+1E9E). The engine is the
    // contract; the oracle diverges only on text carrying such
    // codepoints (absent from testdata, declared in SURVEY §6). Pin
    // the ENGINE mapping so an engine-side drift is loud, and pin
    // that the curation paths are robust BY CONSTRUCTION: a18's
    // ASCII strip swallows the combining dot on both engines.
    val cased = Seq(("\u0130", "\u00DF")).toDF("i", "ss")
      .select(lower($"i").as("li"), upper($"ss").as("us"),
        regexp_replace(lower($"i"), "[^a-z0-9]", "").as("stripped"))
      .as[(String, String, String)].head()
    assert(cased._1 == "i\u0307" && cased._2 == "SS",
      s"engine case mapping must match the Python reference: $cased")
    assert(cased._3 == "i", "the a18-style ASCII strip converges the engines")
  }
}
