package graft

import graft.operators.{Corpus, Sampling}
import org.apache.spark.sql.functions._

/** Round-6 additions, part 2: d12 span-cut dedup, f17 token-budget
  * selection, f18 epoch mixture. Each operator is replayed
  * independently in plain Scala on sf0.001 (or a hand-built corpus)
  * and compared row-for-row — the same independence standard as the
  * DuckDB gate, but with the laws visible in the test body.
  */
class BudgetMixCutSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toksOf(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  // --- d12 dupSpanCut ------------------------------------------------

  test("dupSpanCut: hand corpus — covered positions excised exactly") {
    // "a b c" appears in docs 1 and 2 (once each) → duplicated; doc 3
    // shares nothing. Coverage: doc1 tokens 0-2, doc2 tokens 1-3.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c y"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = Corpus.dupSpanCut(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    val want = Seq(
      (1L, 5L, 2L, md5hex("d e")),
      (2L, 5L, 2L, md5hex("x y")),
      (3L, 5L, 5L, md5hex("p q r s t")))
    assert(got == want)
  }

  test("dupSpanCut: matches a brute-force replay on sf0.001") {
    val raw = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams = raw.map { case (id, t) =>
      val w = toksOf(t)
      id -> w.indices.dropRight(2).map(p => (p, w.slice(p, p + 3).mkString(" ")))
    }.toMap
    val occ = grams.values.flatten.groupBy(_._2).map { case (g, xs) => g -> xs.size }
    val want = raw.map { case (id, t) =>
      val w = toksOf(t)
      val covered = grams(id).filter(x => occ(x._2) >= 2)
        .flatMap(x => x._1 to x._1 + 2).toSet
      val kept = w.indices.filterNot(covered).map(w)
      (id, w.length.toLong, kept.length.toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1).toSeq
    val got = Corpus.dupSpanCut(
        Tables(spark, sfDir, "documents"), "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == want)
  }

  // --- d14 dupSpanExtract ---------------------------------------------

  test("dupSpanExtract: equals brute-force ALL-substring enumeration (the general-length law)") {
    // The operator computes coverage from fixed-L grams; the claim is
    // that this equals coverage by duplicated substrings of ANY length
    // ≥ L (Lee ACL'22 reduction). Verify against an enumeration of
    // every substring of every length — long duplicated region (5 >
    // L=3), an intra-document repeat, and a unique doc.
    val corpus = Seq(
      (1L, "q a b c d e r s"),
      (2L, "x a b c d e y z"),
      (3L, "u v w u v w k"),
      (4L, "p q r s t"))
    val l = 3
    val toks = corpus.map { case (id, t) => id -> toksOf(t) }.toMap
    // count every (length ≥ L) substring occurrence corpus-wide
    val occ = scala.collection.mutable.Map[Seq[String], Int]()
    for ((_, w) <- toks; m <- l to w.length; p <- 0 to w.length - m)
      occ.updateWith(w.slice(p, p + m).toSeq)(c => Some(c.getOrElse(0) + 1))
    // coverage = positions under ANY duplicated substring; maximal runs
    val want = toks.toSeq.flatMap { case (id, w) =>
      val covered = (for {
        m <- l to w.length; p <- 0 to w.length - m
        if occ(w.slice(p, p + m).toSeq) >= 2
        i <- p until p + m
      } yield i).toSet.toSeq.sorted
      val runs = covered.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.reverse
      runs.map { case (s, e) =>
        (id, s.toLong, (e - s + 1).toLong, md5hex(w.slice(s, e + 1).mkString(" ")))
      }
    }.sortBy(r => (r._1, r._2))
    val got = Corpus.dupSpanExtract(
        corpus.toDF("doc_id", "text"), "doc_id", "text", minLen = l)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == want)
    // sanity of the fixture itself: one 5-token cross-doc span and one
    // 6-token intra-doc run actually appear
    assert(want.exists(r => r._3 == 5L) && want.exists(r => r._3 == 6L))
  }

  test("dupSpanExtract: matches an independent L-gram islands replay on sf0.001") {
    val l = 3
    val raw = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val gramOcc = scala.collection.mutable.Map[String, Int]()
    val docGrams = raw.map { case (id, t) =>
      val w = toksOf(t)
      val gs = w.indices.dropRight(l - 1)
        .map(p => (p, w.slice(p, p + l).mkString(" ")))
      gs.foreach { case (_, g) =>
        gramOcc.updateWith(g)(c => Some(c.getOrElse(0) + 1)) }
      (id, w, gs)
    }
    val want = docGrams.flatMap { case (id, w, gs) =>
      val covered = gs.filter(g => gramOcc(g._2) >= 2)
        .flatMap(g => g._1 until g._1 + l).toSet.toSeq.sorted
      val runs = covered.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.reverse
      runs.map { case (s, e) =>
        (id, s.toLong, (e - s + 1).toLong, md5hex(w.slice(s, e + 1).mkString(" ")))
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = Corpus.dupSpanExtract(
        Tables(spark, sfDir, "documents"), "doc_id", "text", minLen = l)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 should contain duplicated 3-gram spans")
  }

  test("dupSpanCut / tokenBudgetSelect: null text = empty document") {
    val docs = Seq((1L, Option("a b c d e")), (2L, None), (3L, Option("a b c d e")))
      .toDF("doc_id", "text")
    val cut = Corpus.dupSpanCut(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(cut(1) == ((2L, 0L, 0L, md5hex(""))))
    assert(cut(0) == ((1L, 5L, 0L, md5hex(""))))  // whole doc duplicated
    val sel = Corpus.tokenBudgetSelect(docs, "doc_id", "text", 1000L)
    assert(sel.filter($"id" === 2L).count() == 0)
    assert(sel.count() == 2)
  }

  test("dupSpanCut: unique corpus passes through untouched") {
    val docs = Seq((1L, "one two three four"), (2L, "five six seven eight"))
      .toDF("doc_id", "text")
    val got = Corpus.dupSpanCut(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._2, r._3)) == Seq((4L, 4L), (4L, 4L)))
    assert(got.head._4 == md5hex("one two three four"))
  }

  // --- f17 tokenBudgetSelect ------------------------------------------

  /** `Text.hash64md5` replayed in memory: first 8 md5 bytes,
    * big-endian signed. */
  private def h64(s: String): Long =
    java.nio.ByteBuffer.wrap(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")), 0, 8).getLong

  /** The operator's shard value at the (buckets=100, refineLevels=2)
    * defaults: pmod(hash64md5("tb:" ++ id), 100^2). */
  private def shardOf(id: Long): Long =
    ((h64(s"tb:$id") % 10000) + 10000) % 10000

  /** The greedy-prefix law replayed in memory: docs ordered by
    * (bucket desc, shard asc, id asc), kept while the tokens before
    * are < B. */
  private def budgetWant(budget: Long): Seq[(Long, Long, Long)] = {
    val scored = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        val w = toksOf(t)
        if (w.isEmpty) None
        else {
          val bucket = math.floor(w.distinct.length.toDouble / w.length * 100).toLong
          Some((id, bucket, w.length.toLong))
        }
      }
      .sortBy { case (id, bucket, _) => (-bucket, shardOf(id), id) }
    var before = 0L
    scored.flatMap { case (id, bucket, nt) =>
      val keep = before < budget
      before += nt
      if (keep) Some((id, bucket, nt)) else None
    }.toSeq
  }

  test("tokenBudgetSelect: equals the greedy prefix at several budgets") {
    for (budget <- Seq(1L, 500L, 3000L, 1000000L)) {
      val got = Corpus.tokenBudgetSelect(
          Tables(spark, sfDir, "documents"), "doc_id", "text", budget)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == budgetWant(budget).sortBy(_._1), s"budget=$budget")
    }
  }

  test("tokenBudgetSelect: tie-degenerate corpus — digit refinement bounds the window input") {
    // 20k docs with IDENTICAL quality (all-distinct tokens → bucket
    // 100 for every row) and a budget that straddles: the quality
    // bucketing alone degenerates completely (the single boundary
    // bucket IS the corpus — pre-round-8 this meant a corpus-sized
    // window partition). The two hash-digit refinement levels must
    // (a) still reproduce the in-memory greedy law exactly and
    // (b) leave only the straddling 1/100^2 shard cell for the final
    // window — a bound that holds regardless of quality ties because
    // the digits are hash digits.
    val n = 20000
    val docs = (1L to n.toLong).map(i => (i, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val budget = 3L * n / 2  // half the corpus tokens
    val got = Corpus.tokenBudgetSelect(docs, "doc_id", "text", budget)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // In-memory law at the same (buckets, refineLevels) defaults.
    val ordered = (1L to n.toLong)
      .map(i => (i, 100L, 3L)).sortBy { case (id, _, _) => (shardOf(id), id) }
    var before = 0L
    val want = ordered.flatMap { case (id, b, nt) =>
      val keep = before < budget
      before += nt
      if (keep) Some((id, b, nt)) else None
    }.sortBy(_._1)
    assert(got == want)
    // The final straddling cell: rows whose full shard equals the
    // shard at which the cumulative sum crosses the budget. Uniform
    // hashing puts ~n/10^4 = 2 expected rows there; assert a loose
    // bound that still catches any degeneration to a corpus-sized
    // (or bucket-sized, n/100) window input.
    var run = 0L
    var crossShard = -1L
    ordered.foreach { case (id, _, nt) =>
      if (crossShard < 0 && run + nt > budget) crossShard = shardOf(id)
      run += nt
    }
    val cellRows = (1L to n.toLong).count(id => shardOf(id) == crossShard)
    assert(cellRows <= 50,
      s"straddling cell should be ~n/10^4 rows, got $cellRows")
  }

  test("tokenBudgetSelect: budget 0 keeps nothing; huge budget keeps every non-empty doc") {
    val docs = Tables(spark, sfDir, "documents")
    assert(Corpus.tokenBudgetSelect(docs, "doc_id", "text", 0L).count() == 0)
    val nonEmpty = docs.select(graft.functions.Text.tokens($"text").as("t"))
      .filter(size($"t") > 0).count()
    assert(Corpus.tokenBudgetSelect(docs, "doc_id", "text", Long.MaxValue / 4)
      .count() == nonEmpty)
  }

  // --- f18 epochMixture -----------------------------------------------

  test("epochMixture: copy counts replay the salted md5 pick exactly") {
    val eps = Map("en" -> 1.0, "de" -> 2.5, "fr" -> 0.25, "es" -> 1.75)
    val out = Sampling.epochMixture(
        Tables(spark, sfDir, "documents"), $"doc_id", $"lang", eps)
      .select($"doc_id", $"lang", $"copy_idx")
      .as[(Long, String, Long)].collect().toSeq
    val wantCopies = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
      .flatMap { case (id, lang) =>
        eps.get(lang).map { e =>
          val whole = math.floor(e).toLong
          val frac = math.floor((e - math.floor(e)) * 1000000).toLong
          val bucket = java.lang.Long.parseLong(
            md5hex(s"$id:ep").take(8), 16) % 1000000
          (id, lang) -> (whole + (if (bucket < frac) 1L else 0L))
        }
      }.toMap.filter(_._2 > 0)
    // group the output: each row id must appear exactly n_copies times
    // with copy_idx dense 1..n
    val byId = out.groupBy(r => (r._1, r._2)).map { case (k, rows) =>
      k -> rows.map(_._3).sorted
    }
    assert(byId.keySet == wantCopies.keySet)
    byId.foreach { case (k, idxs) =>
      assert(idxs == (1L to wantCopies(k)), s"copies for $k")
    }
  }

  test("epochMixture: unlisted domains drop; integer epochs never split") {
    val out = Sampling.epochMixture(
        Tables(spark, sfDir, "documents"), $"doc_id", $"lang",
        Map("en" -> 2.0))
    assert(out.filter($"lang" =!= "en").count() == 0)
    // every en doc appears exactly twice
    val bad = out.groupBy("doc_id").count().filter($"count" =!= 2).count()
    assert(bad == 0)
  }

  // --- f19 weightedSample --------------------------------------------

  /** Text.hash64md5 replay (signed big-endian first 8 md5 bytes). */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  test("weightedSample: selection replays the ES priorities exactly") {
    val raw = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val n = 20
    val want = raw
      .map { case (id, t) =>
        val w = (if (t == null) -1 else toksOf(t).length) + 1
        val u = ((md5Long(s"f19:$id") & ((1L << 53) - 1)) + 1).toDouble /
          (1L << 53).toDouble
        (id, w.toDouble, math.log(u) / w)
      }
      .filter(_._2 > 0)
      .sortBy { case (id, _, k) => (-k, id) }
      .take(n).map(_._1).toSet
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", (size(graft.functions.Text.tokens($"text")) + 1)
        .cast("double").as("w"))
    val got = Sampling.weightedSample(docs, $"doc_id", $"w", n, salt = "f19")
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("weightedSample: scale-invariant in the weights; partitioning-proof") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", (size(graft.functions.Text.tokens($"text")) + 1)
        .cast("double").as("w"))
    val base = Sampling.weightedSample(docs, $"doc_id", $"w", 25)
      .select("id").as[Long].collect().toSet
    // ln(u)/(c*w) preserves the ordering for any c > 0.
    val scaled = Sampling.weightedSample(
        docs.withColumn("w", $"w" * 7.0), $"doc_id", $"w", 25)
      .select("id").as[Long].collect().toSet
    assert(scaled == base)
    val repart = Sampling.weightedSample(docs.repartition(13), $"doc_id", $"w", 25)
      .select("id").as[Long].collect().toSet
    assert(repart == base)
  }

  test("weightedSample: non-positive and null weights cannot be sampled") {
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0)).toDF("k", "w")
      .union(Seq((4L, Option.empty[Double])).toDF("k", "w"))
    val got = Sampling.weightedSample(df, $"k", $"w", 10)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("weightedSample: NaN weights cannot hijack the sample; +Inf wins legitimately") {
    // Spark AND DuckDB evaluate NaN > 0 as true and sort NaN greatest,
    // so unguarded NaN weights would pass the positivity filter, rank
    // above every real priority, and crowd out the whole sample —
    // identically on both engines, i.e. invisible to the oracle gate.
    // The guard drops them; a +Infinity weight stays sampleable and
    // ranks FIRST (ln(u)/inf = -0.0, the w -> inf limit of the ES
    // priority u^(1/w) -> 1).
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 3.0),
      (4L, Double.NaN), (5L, Double.PositiveInfinity)).toDF("k", "w")
    val got = Sampling.weightedSample(df, $"k", $"w", 3)
      .select("id").as[Long].collect().toSeq
    assert(!got.contains(2L) && !got.contains(4L),
      s"NaN-weight rows must be unsampleable, got $got")
    assert(got.head == 5L, s"the infinite weight must rank first, got $got")
    assert(got.toSet == Set(1L, 3L, 5L))
  }
}
