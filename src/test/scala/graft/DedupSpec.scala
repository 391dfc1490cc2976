package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Sketch-dedup fidelity: the LSH/SimHash variants have no SQL oracle
  * (hash-specific), so their guarantee is checked here against the
  * exact n-gram Jaccard pairs on sf0.001.
  */
class DedupSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private lazy val docs = Tables(spark, sfDir, "documents")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  private lazy val exactPairs = pairSet(
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.8))

  test("testdata has planted near-duplicates (precondition)") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash-lsh recalls near-exact duplicate pairs") {
    val got = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, rows = 4, minEstJaccard = 0.5))
    val recall = exactPairs.count(got.contains).toDouble / exactPairs.size
    assert(recall >= 0.9, s"minhash recall $recall of ${exactPairs.size} pairs")
  }

  test("minhash signature estimate tracks true jaccard on near-dups") {
    val est = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 8, rows = 4, minEstJaccard = 0.0)
      .select($"id_a", $"id_b", $"est_jaccard")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.8)
    val joined = est.join(truth, Seq("id_a", "id_b"))
      .select(abs($"est_jaccard" - $"jaccard").as("err"))
      .agg(avg($"err")).as[Double].head()
    assert(joined <= 0.15, s"mean |est - true| = $joined")
  }

  test("graft_minhash scalar signatures are bit-equal to the grouped min-agg form") {
    // The SQL-facing scalar (one narrow projection per doc) must
    // reproduce Dedup.minhashSignatures (min(xxhash64(shingle, i))
    // grouped over exploded rows) exactly — same hash chain, same
    // seed, duplicates can't move a min.
    import graft.functions.{Hashes, Text}
    val k = 16
    val grouped = Dedup.minhashSignatures(
      Dedup.shingles(docs, "doc_id", "text", n = 3), k)
      .as[(Long, Seq[Long])].collect().toMap
    val scalar = docs
      .select($"doc_id", Hashes.minhashSig(
        Text.shingles(Text.tokens($"text"), 3), k).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    assert(scalar.keySet === grouped.keySet)
    scalar.foreach { case (id, sig) =>
      assert(sig === grouped(id), s"signature mismatch for doc $id") }
    // shingle-less input -> NULL, matching the grouped form's no-row
    val empty = Seq("a b").toDF("text")
      .select(Hashes.minhashSig(Text.shingles(Text.tokens($"text"), 3), k))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("MinhashSig codegen: no silent fallback, null contract on random arrays") {
    import graft.functions.Hashes
    // Random shingle arrays incl. null arrays, null elements and empty
    // arrays; repartition blocks constant folding (which would run
    // interpreted eval) and fallback=false turns a broken doGenCode
    // into a hard failure instead of a silent interpreted fallback.
    val rnd = new scala.util.Random(501)
    val rows: Seq[(Long, Option[Seq[Option[String]]])] = (0L until 200L).map { i =>
      i -> (if (rnd.nextInt(10) == 0) None
            else Some((0 until rnd.nextInt(6)).map { _ =>
              if (rnd.nextInt(12) == 0) Option.empty[String]
              else Some(s"s${rnd.nextInt(40)}")
            }))
    }
    val df = rows.toDF("id", "sh").repartition(3)
    val c = spark.conf
    val saved = c.getOption("spark.sql.codegen.fallback")
    try {
      c.set("spark.sql.codegen.fallback", "false")
      val scalar = df.select($"id", Hashes.minhashSig($"sh", 8).as("sig"))
        .filter($"sig".isNotNull)
        .as[(Long, Seq[Long])].collect().toMap
      // Independent grouped formulation: min(xxhash64(elem, i)) over
      // exploded non-null elements.
      val exploded = df.select($"id", explode($"sh").as("shingle"))
        .filter($"shingle".isNotNull)
      val grouped = Dedup.minhashSignatures(exploded, 8)
        .as[(Long, Seq[Long])].collect().toMap
      assert(scalar === grouped)
      // null/empty/all-null-element arrays yield NULL (= no grouped row)
      val expectedNull = rows.collect {
        case (i, sh) if sh.forall(_.forall(_.isEmpty)) => i
      }.toSet
      assert(rows.map(_._1).toSet -- scalar.keySet === expectedNull)
    } finally saved.fold(c.unset("spark.sql.codegen.fallback"))(
      c.set("spark.sql.codegen.fallback", _))
  }

  test("simhash finds the near-exact duplicates") {
    // Short documents put even 0.95-jaccard pairs at Hamming 4-6, so
    // the operating point is the blocking guarantee's edge (k = 6);
    // measured against the jaccard >= 0.9 planted pairs.
    val nearExact = pairSet(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.9))
    val got = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6))
    val recall = nearExact.count(got.contains).toDouble / nearExact.size
    assert(recall >= 0.9, s"simhash recall $recall of ${nearExact.size} pairs")
  }

  test("df-capped shingles drop only high-frequency shingles") {
    val uncapped = Dedup.shingles(docs, "doc_id", "text", 3)
    val capped = Dedup.shingles(docs, "doc_id", "text", 3, dfCap = 5)
    val maxDf = capped.groupBy("shingle").count().agg(max("count")).as[Long].head()
    assert(maxDf <= 5)
    assert(capped.count() < uncapped.count())
  }

  test("SimhashAgg matches the declarative 64-sum formulation") {
    import graft.functions.Text
    val tok = docs
      .select(col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))
      .select(col("id"), explode(Text.shingles(col("toks"), 1)).as("token"))
      .withColumn("th", Text.hash64md5(col("token")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("th"), i).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"b$i") }
    val fpExpr = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    val declarative = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fpExpr.as("fp")).as[(Long, Long)].collect().toMap
    val typed = Dedup.simhashFingerprints(docs, "doc_id", "text", 1)
      .as[(Long, Long)].collect().toMap
    assert(typed == declarative)
  }

  test("prefix-filtered jaccard join returns exactly the count-join pairs") {
    val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5,
        prefixFilter = true)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(pref == naive)
  }

  test("keepCanonical keeps one doc per cluster and every untouched doc") {
    // Chain 1~2, 2~3 is ONE cluster (keeper 1); 7~8 another (keeper
    // 7); 5 is untouched. Pairwise dropping would wrongly keep 3
    // (its only pair partner 2 loses to 1) — the component view
    // must not.
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"), (7L, "f"), (8L, "g"))
      .toDF("doc_id", "payload")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonical(corpus, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 5L, 7L))
  }

  test("lsh knn achieves reasonable recall vs exact knn") {
    val emb = Tables(spark, sfDir, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.knnBruteForce(qs, emb, "vec_id", "embedding", 10))
    val approx = topSets(Similarity.knnLsh(qs, emb, "vec_id", "embedding", 10,
      dim = 64))
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@10 = $mean")
  }

  test("d16 incremental components equal d7's full recompute on real documents") {
    // The registered d16 plan (old assignment + componentsDelta over
    // the slice's new pairs, upserted) must reproduce the registered
    // d7 plan (full min-label propagation over ALL pairs) on the
    // actual testdata — the Spark-side twin of the shared DuckDB
    // oracle, covering the real planted-duplicate merge shapes.
    def labelMap(name: String): Map[Long, Long] =
      SparkEntry.queries(name)(spark, sfDir)
        .as[(Long, Long)].collect().toMap
    assert(labelMap("d16_components_incremental") ===
      labelMap("d7_dedup_components"))
  }

  test("pairsEval: counts equal set arithmetic; orientation-insensitive") {
    val docs = Tables(spark, sfDir, "documents")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
    val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, rows = 4, minEstJaccard = 0.5)
    // NOT the class-level pairSet helper: this one orientation-
    // normalizes, which is the operator contract under test.
    def normPairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val t = normPairSet(truth)
    val c = normPairSet(cand)
    assert(t.nonEmpty && c.nonEmpty, "testdata must contain dup pairs")
    val m = (t & c).size.toLong
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Dedup.pairsEval(cand, truth)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row == ((t.size.toLong, c.size.toLong, m,
      round4(m.toDouble / c.size), round4(m.toDouble / t.size))))
    // Orientation-insensitive: reversing one side's columns (and
    // duplicating its rows) must not move any count.
    val flipped = cand.select(col("id_b").as("id_a"), col("id_a").as("id_b"))
      .unionByName(cand.select("id_a", "id_b"))
    val row2 = Dedup.pairsEval(flipped, truth)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row2 == row)
    // Empty candidate side: zero scores, no divide-by-zero.
    val empty = cand.filter(lit(false))
    val row3 = Dedup.pairsEval(empty, truth)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row3 == ((t.size.toLong, 0L, 0L, 0.0, 0.0)))
  }
}
