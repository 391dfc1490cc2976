package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** cosinePairsLsh (the 100 TB path for d5's contract) has no SQL
  * oracle — hyperplane seeds are engine-specific — so its guarantee is
  * pinned here against the exact all-pairs variant on sf0.001:
  * precision is exactly 1 (every candidate is re-scored with the same
  * dot product and threshold), recall has a floor.
  */
class SimilarityLshSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap

  test("lsh cosine pairs are an exact-scored subset of the all-pairs result") {
    val exact = pairs(Similarity.cosinePairs(emb, "vec_id", "embedding", tau = 0.35))
    val lsh = pairs(Similarity.cosinePairsLsh(emb, "vec_id", "embedding", tau = 0.35,
      dim = 64))
    assert(exact.nonEmpty, "testdata must contain cosine>=0.35 pairs")
    // Precision 1.0: every LSH pair is a true pair with the same score.
    lsh.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k")
      assert(exact(k) == c, s"score mismatch on $k")
    }
    val recall = exact.keys.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.55, s"recall $recall over ${exact.size} true pairs")
  }

  test("e10: range search = unbounded-k knn filtered at tau; recall floor vs exact") {
    val q = emb.filter($"vec_id" % 50 === 0)
    val tau = 0.35
    val range = Similarity.rangeSearchLsh(q, emb, "vec_id", "embedding", tau,
        dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    // Identity: same candidates, same rescore — the rank stage is the
    // only difference between the two contracts.
    val viaKnn = Similarity.knnLsh(q, emb, "vec_id", "embedding",
        k = Int.MaxValue, dim = 64)
      .filter($"cosine" >= tau).drop("rank")
      .as[(Long, Long, Double)].collect().toSet
    assert(range == viaKnn)
    // Precision 1.0 + recall floor vs the exact thresholded retrieval
    // (brute-force with k = corpus size, thresholded the same way).
    val n = emb.count().toInt
    val exact = Similarity.knnBruteForce(q, emb, "vec_id", "embedding", k = n,
        allowLargeInput = true)
      .filter($"cosine" >= tau).select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "testdata must contain in-range neighbors")
    assert(range.subsetOf(exact), "false positive in range search")
    val recall = exact.count(range.contains).toDouble / exact.size
    assert(recall >= 0.55, s"recall $recall over ${exact.size} true matches")
  }

  test("null embeddings do not corrupt pairs") {
    // Null vectors must be ignored throughout: their unit form is
    // null, every dot is null, and the tau filter drops null scores —
    // they must never surface as pairs or poison real ones.
    val df = Seq(
      (1L, Some(Seq(1.0, 0.0))), (2L, Some(Seq(1.0, 0.0))),
      (0L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val got = pairs(Similarity.cosinePairsLsh(df, "vec_id", "embedding",
      tau = 0.5, dim = 2))
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === 1.0)
  }

  test("empty input yields an empty result, not a failure") {
    assert(Similarity.cosinePairsLsh(
      emb.filter($"vec_id" < 0), "vec_id", "embedding", tau = 0.5,
      dim = 64).count() == 0)
  }

  test("pq geometry is verified against the codebook stamp; empty fit fails loudly") {
    // A caller-supplied m that disagrees with the codebook's build
    // geometry would split vectors into the wrong subspaces and emit
    // wrong codes; the schema stamp makes that a fail-fast instead.
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", 4, 16, 0, dim = 64)
    val e = intercept[IllegalArgumentException](
      Similarity.quantizePq(emb, "vec_id", "embedding", cb, m = 8, dim = 64))
    assert(e.getMessage.contains("build geometry"), e.getMessage)
    // Fitting on an empty/all-null corpus must be loud, not an empty
    // codebook that quantizes everything to zero rows downstream —
    // and the guard throw must FREE its corpus cut (persisted-RDD map
    // must not grow across the intercept; r11 second review).
    val before = ss.sparkContext.getPersistentRDDs.keySet
    val e2 = intercept[IllegalArgumentException](
      Similarity.pqCodebook(emb.filter($"vec_id" < 0), "vec_id", "embedding",
        4, 16, 0, dim = 64))
    assert(e2.getMessage.contains("no non-null vectors"), e2.getMessage)
    val leaked = ss.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"empty-fit guard leaked persisted RDDs: $leaked")
  }

  test("omitting dim fails fast instead of running a driver probe job") {
    // dim is trusted caller metadata (the embedding model's output
    // width); the library must never fall back to a synchronous 1-row
    // probe job per call. Each entry point names the contract.
    for ((name, thunk) <- Seq[(String, () => Any)](
      ("cosinePairsLsh", () =>
        Similarity.cosinePairsLsh(emb, "vec_id", "embedding", tau = 0.35)),
      ("knnLsh", () =>
        Similarity.knnLsh(emb, emb, "vec_id", "embedding", k = 5)),
      ("rangeSearchLsh", () =>
        Similarity.rangeSearchLsh(emb, emb, "vec_id", "embedding", tau = 0.35)),
      ("pqCodebook", () =>
        Similarity.pqCodebook(emb, "vec_id", "embedding", 4, 16)),
      ("knnIvfPq", () =>
        Similarity.knnIvfPq(emb, emb, "vec_id", "embedding", k = 5)))) {
      val e = intercept[IllegalArgumentException](thunk())
      assert(e.getMessage.contains(name) &&
        e.getMessage.contains("embedding dimension"), s"$name: ${e.getMessage}")
    }
  }

  test("ArrayNormalize matches the staged cast/norm/divide formulation exactly") {
    import graft.functions.Vectors
    // Random float arrays incl. null arrays, null elements, zero
    // vectors and empties; repartition blocks constant folding and
    // fallback=false turns a broken doGenCode into a hard failure.
    val rnd = new scala.util.Random(502)
    val rows: Seq[Option[Seq[Option[Float]]]] = (0 until 300).map { _ =>
      if (rnd.nextInt(10) == 0) None
      else Some((0 until rnd.nextInt(6)).map { _ =>
        rnd.nextInt(8) match {
          case 0 => Option.empty[Float]
          case 1 => Some(0.0f)
          case _ => Some(rnd.nextFloat() * 4 - 2)
        }
      })
    }
    val df = rows.toDF("v").repartition(3)
    val c = spark.conf
    val saved = c.getOption("spark.sql.codegen.fallback")
    try {
      c.set("spark.sql.codegen.fallback", "false")
      val got = df.select(Vectors.normalize($"v").as("u"))
        .as[Option[Seq[Option[Double]]]].collect().toSeq
      // independent: the three-projection staged form
      val want = df
        .select(transform($"v", x => x.cast("double")).as("__v"))
        .select($"__v", Vectors.norm($"__v").as("__n"))
        .select(when($"__n" === 0.0, $"__v")
          .otherwise(transform($"__v", x => x / $"__n")).as("u"))
        .as[Option[Seq[Option[Double]]]].collect().toSeq
      assert(got === want)
      assert(got.exists(_.exists(_.exists(_.isDefined))), "vacuous input")
    } finally saved.fold(c.unset("spark.sql.codegen.fallback"))(
      c.set("spark.sql.codegen.fallback", _))
  }

  test("e5: PQ codes are valid, decodable, and Lloyd refinement never hurts") {
    import graft.operators.Similarity
    import graft.functions.Vectors
    val v = emb.select($"vec_id".as("id"),
      transform($"embedding", _.cast("double")).as("v"))
    def quality(iters: Int): (Double, Double) = {
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", 4, 16, iters,
        dim = 64)
      val codes = Similarity.quantizePq(emb, "vec_id", "embedding", cb,
        m = 4, dim = 64)
      if (iters == 0) {
        // every vector gets m codes, each one of the 16 sampled ids
        val rows = codes.select($"codes").as[Seq[Int]].collect()
        assert(rows.nonEmpty && rows.forall(c => c.length == 4 &&
          c.forall(x => x >= 0 && x < 16 * 50)))
        val seedIds = emb.orderBy($"vec_id").limit(16)
          .select($"vec_id").as[Long].collect().map(_.toInt).toSet
        assert(rows.flatten.toSet.subsetOf(seedIds))
      }
      val rec = Similarity.pqReconstruct(codes, cb)
      val j = rec.join(v, "id")
        .withColumn("se", aggregate(zip_with($"v", $"vhat",
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
        .withColumn("cos", Vectors.dot($"v", $"vhat") /
          (Vectors.norm($"v") * Vectors.norm($"vhat")))
      val r = j.agg(avg("se"), avg("cos")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (mse0, cos0) = quality(0)
    val (mse2, cos2) = quality(2)
    // k-means monotonicity (modulo the 9-dp mean rounding): refinement
    // must not make reconstruction worse. Observed on this data:
    // mse 1.06 → 0.74, cos 0.42 → 0.51.
    assert(mse2 <= mse0 + 1e-6, s"lloyd worsened mse: $mse0 -> $mse2")
    assert(cos2 >= cos0 - 1e-6, s"lloyd worsened cosine: $cos0 -> $cos2")
    assert(cos2 > 0.45, s"refined reconstruction too weak: $cos2")
  }

  test("all-pairs baselines refuse oversized inputs unless explicitly allowed") {
    // The exact variants are declared validation baselines; above the
    // threshold they must fail LOUDLY (naming the scale path), never
    // silently run an O(N^2) plan on a corpus-sized input.
    val e1 = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(emb, "vec_id", "embedding", tau = 0.35,
        maxExactInput = 10L)
    }
    assert(e1.getMessage.contains("cosinePairsLsh"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.knnBruteForce(emb, emb, "vec_id", "embedding", k = 5,
        maxExactInput = 10L)
    }
    assert(e2.getMessage.contains("knnLsh"))
    // The override runs the quadratic plan (tiny threshold, same data).
    assert(Similarity.cosinePairs(emb, "vec_id", "embedding", tau = 0.35,
      allowLargeInput = true, maxExactInput = 10L).count() > 0)
  }

  test("int8 quantization: range, constant vectors, half-step dequant error") {
    import org.apache.spark.sql.functions._
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding").cache()
    try {
      // every code in [0, 255]
      assert(q.filter(exists(col("q"), c => c < 0 || c > 255)).count() == 0)
      // dequantized value mn + (q+0.5)·step stays within step/2 + ulp
      // of the original for every dimension (step = (mx-mn)/255)
      val step = (col("mx") - col("mn")) / 255.0
      val err = q
        .join(emb.select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v")), "id")
        .filter(col("mx") =!= col("mn"))
        .select(col("id"), col("mn"), step.as("st"),
          arrays_zip(col("v"), col("q")).as("z"))
        .select(col("id"),
          size(filter(col("z"), z =>
            abs(z.getField("v") - (col("mn") + (z.getField("q") + 0.5) * col("st")))
              > col("st") * 0.5 + lit(1e-9))).as("n_bad"))
        .agg(sum(col("n_bad"))).head().getLong(0)
      assert(err == 0, s"$err dimensions outside the half-step bound")
      // constant vector quantizes to all zeros
      val const = Similarity.quantizeInt8(
        Seq((1L, Seq(2.5, 2.5, 2.5))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
        .select(explode(col("q"))).as[Int].collect()
      assert(const.toSeq == Seq(0, 0, 0))
    } finally q.unpersist()
  }

  test("e11: ivfPqIndexDelta equals an independent brute-force recomputation") {
    import org.apache.spark.sql.functions.concat_ws
    val old = emb.filter($"vec_id" % 10 =!= 0)
    val slice = emb.filter($"vec_id" % 10 === 0)
    val (cent, cb) = Similarity.ivfPqFit(old, "vec_id", "embedding", dim = 64)
    val delta = Similarity
      .ivfPqIndexDelta(slice, "vec_id", "embedding", cent, cb, m = 8, dim = 64)
      .select($"id", $"cid", concat_ws(",", $"codes").as("codes"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // Independent reimplementation: collect the (tiny) structures and
    // the slice, recompute every assignment in plain Scala with the
    // operators' stated contracts (ascending-index dots, argmax dot
    // with cid-asc tie-break, 6-dp-rounded argmin with cid-asc
    // tie-break), and demand byte-identical delta rows.
    val cents = cent.select($"cid", $"cvec").as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    val books = cb.select($"s", $"cid", $"cvec").as[(Int, Long, Array[Double])]
      .collect()
    val raw = slice.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
    assert(raw.nonEmpty && raw.length == delta.size,
      s"expected one delta row per slice vector (${raw.length} vs ${delta.size})")

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }; s
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    raw.foreach { case (id, fv) =>
      val v = fv.map(_.toDouble)
      var n2 = 0.0; v.foreach(x => n2 += x * x)
      val nrm = math.sqrt(n2)
      val u = if (nrm == 0.0) v else v.map(_ / nrm)
      val bestCid = cents.map { case (cid, cv) => (dot(u, cv), cid) }
        .reduceLeft((a, b) =>
          if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a)._2
      val codes = (0 until 8).map { s =>
        val sub = u.slice(s * 8, s * 8 + 8)
        books.filter(_._1 == s).map { case (_, cid, cw) =>
          (round6(dot(sub, sub) + dot(cw, cw) - 2.0 * dot(cw, sub)), cid)
        }.minBy(identity)._2
      }.mkString(",")
      assert(delta(id) == ((bestCid, codes)), s"vector $id mismatch")
    }
  }

  test("e11: null vectors are skipped, zero vectors index deterministically") {
    import org.apache.spark.sql.functions.concat_ws
    val old = emb.filter($"vec_id" % 10 =!= 0)
    val (cent, cb) = Similarity.ivfPqFit(old, "vec_id", "embedding", dim = 64)
    val slice = Seq(
      (900001L, Some(Array.fill(64)(0.0f))), // zero vector
      (900002L, None: Option[Array[Float]])  // missing embedding
    ).toDF("vec_id", "embedding")
    val delta = Similarity
      .ivfPqIndexDelta(slice, "vec_id", "embedding", cent, cb, m = 8, dim = 64)
      .select($"id", $"cid", concat_ws(",", $"codes").as("codes"))
      .as[(Long, Long, String)].collect()
    // Null vector: no row. Zero vector: all dots 0 -> min-cid cell.
    assert(delta.map(_._1).toSet == Set(900001L))
    val minCid = cent.select($"cid").as[Long].collect().min
    val zeroRow = delta.head
    assert(zeroRow._2 == minCid,
      s"zero vector must land in the min-cid cell, got ${zeroRow._2}")
    assert(zeroRow._3.split(",").length == 8)
  }
}
