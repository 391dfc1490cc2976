package graft

import graft.functions.Text
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-6 additions: NFC normalization (expression + f14 query),
  * the zero-shuffle f13 quality gate, and the e7 signed random
  * projection sketch.
  */
class Round6Spec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  // --- NfcNormalize expression -------------------------------------

  test("NfcNormalize: composes decomposed sequences (UAX #15 vectors)") {
    // e+U+0301 -> U+00E9, n+U+0303 -> U+00F1, A+U+030A -> U+00C5;
    // already-composed and plain-ASCII inputs are unchanged.
    val rows = Seq(
      "Café" -> "Café",
      "niño" -> "niño",
      "Å" -> "Å",
      "Café" -> "Café",
      "plain ascii" -> "plain ascii",
      "" -> "")
    val got = rows.map(_._1).toDF("s")
      .select(Text.nfc($"s")).as[String].collect().toSeq
    assert(got == rows.map(_._2))
  }

  test("NfcNormalize: null in, null out; interpreted matches codegen") {
    val viaDf = Seq[Option[String]](None).toDF("s")
      .select(Text.nfc($"s")).collect().head
    assert(viaDf.isNullAt(0))
    val interp = graft.functions.expr.NfcNormalizeUtil
      .nfc(UTF8String.fromString("Café Å")).toString
    val codegen = Seq("Café Å").toDF("s")
      .select(Text.nfc($"s")).as[String].head()
    assert(interp == codegen && codegen == "Café Å")
  }

  test("NfcNormalize: fast path returns already-normalized input unchanged") {
    val s = UTF8String.fromString("already composed é")
    // Reference equality: the common already-NFC case must not copy.
    assert(graft.functions.expr.NfcNormalizeUtil.nfc(s) eq s)
  }

  test("graft_nfc is callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_nfc('Café') AS n")
      .as[String].head()
    assert(r == "Café")
  }

  test("f14 query: composition removes exactly the 3 decorated marks, zero shuffles") {
    val df = SparkEntry.queries("f14_nfc_normalize")(spark, sfDir)
    val qe = df.queryExecution
    assert(!qe.executedPlan.toString.contains("Exchange"),
      s"f14 must be a narrow projection\n${qe.executedPlan}")
    val bad = df.filter(col("nfc_cp") =!= col("raw_cp") - 3).count()
    assert(bad == 0)
    assert(df.filter(col("nfc_prefix") =!= lit("Café ")).count() == 0)
  }

  // --- f13 quality gate ---------------------------------------------

  test("f13: narrow max-run scan agrees with an explode+groupBy recount") {
    val f13 = SparkEntry.queries("f13_quality_gate")(spark, sfDir)
    // Independent recomputation of the top-bigram fraction: the
    // conventional shuffle plan over the same tokenizer/shingler.
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles(col("toks"), 2)).as("g"))
    val expect = docs.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6)
        .as("expect_topgf"))
    val joined = f13.join(expect, Seq("doc_id"), "left")
      .filter(coalesce(col("expect_topgf"), lit(0.0)) =!= col("top2gram_frac"))
    assert(joined.count() == 0)
  }

  test("f13: rules fire as documented and keep == no reasons") {
    val f13 = SparkEntry.queries("f13_quality_gate")(spark, sfDir).cache()
    try {
      assert(f13.filter((col("reasons") === "") =!= col("keep")).count() == 0)
      assert(f13.filter(col("n_tokens") < 25 &&
        !col("reasons").contains("too_short")).count() == 0)
      assert(f13.filter(col("dup_token_frac") > 0.6 &&
        !col("reasons").contains("dup_tokens")).count() == 0)
      // Non-degenerate on the synthetic corpus: both classes present.
      val kept = f13.filter(col("keep")).count()
      assert(kept > 0 && kept < f13.count())
    } finally f13.unpersist()
  }

  test("f13: the gate is a pure map — zero exchanges in the executed plan") {
    val p = SparkEntry.queries("f13_quality_gate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"f13 must not shuffle\n$p")
  }

  // --- d11 incremental dedup ----------------------------------------

  test("ngramJaccardAgainst equals the cross-slice subset of the full pair join") {
    // The bipartite form must return exactly the full self-join's
    // pairs that cross the slice boundary — no more, no less.
    val docs = Tables(spark, sfDir, "documents")
    val got = graft.operators.Dedup.ngramJaccardAgainst(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val full = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, tau = 0.5)
      .as[(Long, Long, Double)].collect()
    val want = full.collect {
      case (a, b, j) if a % 10 == 0 && b % 10 != 0 => (a, b, j)
      case (a, b, j) if b % 10 == 0 && a % 10 != 0 => (b, a, j)
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "precondition: planted dups must cross the slice")
  }

  test("ngramJaccardAgainst dfCap cuts the same shingles from both sides") {
    // The operator's contract: with a cap, scores equal plain Jaccard
    // over the shingle universe with the EXISTING-side over-cap
    // shingles removed from BOTH sides. Recompute that independently
    // on collected shingle sets (Scala collections, no Spark join) —
    // a one-sided cut (the bug this guards) inflates n_new for any
    // incoming doc that carries a dropped shingle, so its scores
    // diverge and the set equality fails.
    val docs = Tables(spark, sfDir, "documents")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val cap = 5L
    val tau = 0.1
    val capped = graft.operators.Dedup.ngramJaccardAgainst(
        existing, incoming, "doc_id", "text", n = 3, tau = tau, dfCap = cap)
      .as[(Long, Long, Double)].collect()
    assert(capped.nonEmpty,
      "precondition: the capped run must return pairs or the check is vacuous")
    val exSh = graft.operators.Dedup.shingles(existing, "doc_id", "text", 3)
      .as[(Long, String)].collect()
    val inSh = graft.operators.Dedup.shingles(incoming, "doc_id", "text", 3)
      .as[(Long, String)].collect()
    val drop = exSh.groupBy(_._2).collect {
      case (sh, rows) if rows.length > cap => sh
    }.toSet
    assert(drop.nonEmpty,
      "precondition: the cap must actually drop shingles at this sf")
    def sets(rows: Array[(Long, String)]): Map[Long, Set[String]] =
      rows.filterNot(t => drop(t._2)).groupBy(_._1)
        .map { case (id, v) => id -> v.map(_._2).toSet }
    val exSets = sets(exSh)
    val want = (for {
      (ni, ns) <- sets(inSh).toSeq
      (oi, os) <- exSets.toSeq
      shared = (ns & os).size
      if shared > 0
      j = shared.toDouble / (ns.size + os.size - shared)
      if j >= tau
    } yield (ni, oi, BigDecimal(j) // the operator rounds half-up to 6 dp
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(capped.toSet == want)
  }

  // --- the md5 hash bridge ------------------------------------------

  test("Text.hash64md5 equals the signed big-endian first-8-md5-bytes reference") {
    // This expression is the bridge every sketch oracle rests on
    // (DuckSql.hash64md5 replays it in SQL — verified there against
    // the same definition). Reference: MessageDigest + ByteBuffer.
    val rnd = new scala.util.Random(606)
    val samples = Seq("", "a", "hello", "0:the quick brown", "é π ≠") ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(24)).mkString)
    val got = samples.toDF("s")
      .select(Text.hash64md5(col("s"))).as[Long].collect()
    val want = samples.map { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }
    assert(got.toSeq == want)
  }

  // --- oracle-coverage invariant ------------------------------------

  test("every registered query is oracled — no rows-only cells") {
    // Since round 8 even a23 has a machine oracle (expected-vectors
    // parquet + injectivity invariant), so the rows-only set must be
    // EMPTY. Any new query landing without an oracle — or an oracle
    // for a nonexistent query — fails here before the driver's gate
    // ever sees it.
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles).isEmpty,
      s"rows-only set drifted: ${(queries -- oracles).toSeq.sorted}")
    assert((oracles -- queries).isEmpty,
      s"orphan oracles: ${(oracles -- queries).toSeq.sorted}")
  }

  // --- df-cap anti-join plan shape ----------------------------------

  test("dfCap cut executes as a BROADCAST anti join (edge stream never shuffled for the cut)") {
    // The over-cap element set is bounded by E/dfCap; AQE must turn
    // the cut into a broadcast LEFT ANTI join rather than shuffling
    // the whole edge stream against the huge keep set (the pre-r6
    // shape). Executed on real data so the assertion is about the
    // FINAL adaptive plan, not the static one.
    val mem = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("coll"), col("l_partkey").as("member"))
      .distinct()
    val qe = graft.operators.Relational
      .overlapPairs(mem, "coll", "member", dfCap = 40L)
      .queryExecution
    qe.executedPlan.execute().count()
    val p = qe.executedPlan.toString
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"dfCap cut must be a broadcast anti join\n$p")
  }

  // --- e7 signed random projection ----------------------------------

  test("e7: matches an in-memory reimplementation (quantize + md5-parity signs)") {
    val k = 16
    val rows = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(20)
      .as[(Long, Array[Float])].collect()
    def signOf(i: Int, j: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
      if ((d(7) & 1) == 0) 1L else -1L
    }
    val expect = rows.flatMap { case (id, v) =>
      val d = v.map(_.toDouble)
      val (mn, mx) = (d.min, d.max)
      val q =
        if (mx == mn) d.map(_ => 0L)
        else d.map(x => math.max(0.0,
          math.min(math.floor((x - mn) * 255.0 / (mx - mn)), 255.0)).toLong)
      (0 until k).map { j =>
        (id, j.toLong, q.indices.map(i => q(i) * signOf(i, j)).sum)
      }
    }.toSet
    val got = Similarity.randomSignProjection(
        Tables(spark, sfDir, "embeddings").limit(20),
        "vec_id", "embedding", k = k, dim = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("e7: narrow plan — no exchange, no driver action") {
    val p = Similarity.randomSignProjection(
        Tables(spark, sfDir, "embeddings"), "vec_id", "embedding", 16, 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"e7 must not shuffle\n$p")
  }

  test("e7: sign matrix is balanced enough to carry signal") {
    // md5-parity signs: no column may be near-constant (that
    // component would collapse to ±sum of codes), and no long
    // equal-sign runs (the LCG-parity scheme this replaced ran in
    // ~12-cell streaks — caught by the LSH recall floor).
    val k = 16
    def signOf(i: Int, j: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
      if ((d(7) & 1) == 0) 1L else -1L
    }
    (0 until k).foreach { j =>
      val signs = (0 until 64).map(i => signOf(i, j))
      val pos = signs.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"component $j degenerate: $pos/64 positive")
      // The LCG-parity scheme flipped sign only ~5 times per column
      // (long streaks); iid signs flip ~31 times. A floor of 15
      // separates the two regimes with huge margin on both sides.
      val flips = signs.sliding(2).count(p => p.head != p.last)
      assert(flips >= 15, s"component $j has only $flips sign changes")
    }
  }
}
