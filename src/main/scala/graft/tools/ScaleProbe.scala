package graft.tools

import graft.Tables
import graft.operators.{Collections, Corpus, Dedup, Graph, Relational}
import graft.queries.GroupP
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: runs the shuffle-heaviest operators on the sf
  * tables AND on a K×-scaled in-memory derivation (key-shifted
  * unions), printing per-operator seconds at both sizes so the
  * observed scaling exponent is measurable, not assumed. Local run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.ScaleProbe 4'
  *
  * Near-linear ratios (≈ K, modulo fixed job latency) are the
  * evidence that the plans shuffle on keys whose cardinality grows
  * with the data — the property that matters at 100 TB — rather than
  * on anything quadratic. Operators whose K×-cost is BY DESIGN
  * super-linear in rows but bounded by a declared knob (overlapPairs'
  * dfCap) are probed with the knob engaged, which is how they are
  * registered in SparkEntry too. Text/dedup operators are excluded:
  * duplicating documents K× manufactures pathological near-dup
  * structure a real corpus doesn't have, so their probe would measure
  * the synthetic duplication, not the operator.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // K copies with shifted group keys: group COUNT scales with K
    // (new collections/orders), member/part ids stay shared — the
    // realistic direction (more documents, same vocabulary).
    val SHIFT = 10_000_000L
    def scaled(df: DataFrame, shiftCols: Seq[String]): DataFrame =
      (0 until k).map { i =>
        shiftCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * SHIFT)))
      }.reduce(_ unionByName _).localCheckpoint()

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // The 1× pass runs once untimed first: whole-stage codegen and JIT
    // compile on the first execution of a plan shape, and without the
    // warmup the 1× number absorbs them and the ratio reads sub-1.
    def report(name: String, one: => Unit, kx: => Unit): Unit = {
      one
      val t1 = time(one); val tk = time(kx)
      println(f"[scale] $name%-18s 1x ${t1}%7.2f s   ${k}x ${tk}%7.2f s   ratio ${tk / t1}%5.2f (ideal <= $k)")
    }

    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice").localCheckpoint()
    val liK = scaled(li, Seq("l_orderkey"))
    // For the overlap probe BOTH keys shift: scaling only the
    // collection side multiplies every member's document frequency by
    // K, so the dfCap would cut everything and the probe would
    // measure the cut, not the operator. Shifting both keeps the df
    // distribution fixed and multiplies the edges — the corpus-grows
    // direction.
    val liKBoth = scaled(li, Seq("l_orderkey", "l_partkey"))

    // a6 shape: group-collect per collection.
    def groupCollect(m: DataFrame): DataFrame =
      m.groupBy("l_orderkey")
        .agg(concat_ws(",", sort_array(collect_list(col("l_partkey")))).as("members"),
             count(lit(1)).as("cnt"))
    report("a6 group-collect",
      noop(groupCollect(li)), noop(groupCollect(liK)))

    // a25 shape: df-capped member-overlap pairs, both generators.
    // (The probe is what demoted the array path from capped default
    // to opt-in: super-linear under memory pressure vs the join.)
    def overlap(m: DataFrame, arrays: Boolean): DataFrame =
      Relational.overlapPairs(
        m.select(col("l_orderkey").as("coll"), col("l_partkey").as("member")).distinct(),
        "coll", "member", dfCap = 40L, boundedDf = arrays)
    report("a25 cap+join",
      noop(overlap(li, false)), noop(overlap(liKBoth, false)))
    report("a25 cap+arrays",
      noop(overlap(li, true)), noop(overlap(liKBoth, true)))

    // b2 shape: cone-seeded reachability + validation counts.
    val edges = GroupP.typeEdgesOf(spark, sfDir).localCheckpoint()
    def validate(m: DataFrame): DataFrame = {
      val mem = m.select(col("l_partkey").as("t"),
        (col("l_orderkey") % 30 + 2).as("required"))
      val closure = Graph.reachableTo(edges,
        mem.select(col("required").as("dst")), uniquePaths = true, stride = 4)
      Graph.validateReachable(mem, closure, "t", "required")
        .groupBy("required").agg(sum(when(col("valid"), 1L).otherwise(0L)).as("v"))
    }
    report("b2 validate",
      noop(validate(li)), noop(validate(liK)))

    // p1: the whole composed pipeline (orders/lineitem scale, the
    // entity/type dims stay fixed — dims are dims at every scale).
    val orders = GroupP.collectionsOf(spark, sfDir).localCheckpoint()
    val ordersK = scaled(orders, Seq("collection_id"))
    val entities = GroupP.entitiesOf(spark, sfDir).localCheckpoint()
    def pipeline(m: DataFrame, c: DataFrame): DataFrame =
      Collections.build(
        m.select(col("l_orderkey").as("collection_id"),
          col("l_partkey").as("member_id"), col("l_extendedprice").as("score")),
        entities, c, edges, topK = 5, closureUniquePaths = true)
    report("p1 build",
      noop(pipeline(li, orders)), noop(pipeline(liK, ordersK)))

    // Corpus ops: duplicating documents K× is fine HERE (unlike the
    // pair-generating dedup family) — tfidf/contamination never pair
    // documents, so copies only multiply rows: tf rows ×K, df ×K,
    // shingle join ×K. The probe measures exactly the keyed-agg +
    // broadcast-join scaling that matters.
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").localCheckpoint()
    val docsK = scaled(docs, Seq("doc_id"))
    report("f8 tfidf",
      noop(Corpus.tfidfTopTerms(docs, "doc_id", "text", 3)),
      noop(Corpus.tfidfTopTerms(docsK, "doc_id", "text", 3)))
    report("d9 contamination",
      noop(Corpus.contamination(docs, "doc_id", "text", 3, col("doc_id") % 20 === 0)),
      noop(Corpus.contamination(docsK, "doc_id", "text", 3, col("doc_id") % 20 === 0)))

    // d7/d8 shape: pair→cluster resolution + the canonical cut.
    // Scaling duplicates the PAIR STRUCTURE, not the documents: both
    // pair ids shift per copy, so the component count scales K× while
    // cluster shapes — diameter, the thing that sets the round count —
    // stay fixed. That is the corpus-grows direction for dedup
    // clusters (more clusters, not deeper ones).
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
      .select("id_a", "id_b").localCheckpoint()
    val pairsK = scaled(pairs, Seq("id_a", "id_b"))
    report("d7 components",
      noop(Graph.connectedComponents(pairs)),
      noop(Graph.connectedComponents(pairsK)))
    report("d8 canonical-cut",
      noop(Dedup.keepCanonical(docs, pairs, "doc_id")),
      noop(Dedup.keepCanonical(docsK, pairsK, "doc_id")))

    // p2: the whole composed corpus pipeline (same definition the
    // oracled query runs). Copies must DIFFER in text — a vowel
    // rotation per copy — or the K× corpus would manufacture
    // cross-copy exact duplicates and the pair join would measure K²
    // structure no real corpus has; in-copy planted near-dups survive
    // the rotation (both sides rotate identically). doc_id shifts keep
    // the %20 benchmark slice aligned (SHIFT is divisible by 20).
    val docsFull = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    val docsP2K = (0 until k).map { i =>
      val r = i % 5
      docsFull.withColumn("doc_id", col("doc_id") + lit(i.toLong * SHIFT))
        .withColumn("text",
          translate(col("text"), "aeiou", "aeiou".drop(r) + "aeiou".take(r)))
    }.reduce(_ unionByName _).localCheckpoint()
    report("p2 pipeline",
      noop(GroupP.corpusPipeline(docsFull)),
      noop(GroupP.corpusPipeline(docsP2K)))

    // g5 shape: two-level exact distinct (shifted user ids multiply
    // the per-window distinct-user count — the audience-grows
    // direction; both aggregation levels should scale on rows).
    val ev = Tables(spark, sfDir, "events")
      .select("user_id", "event_type", "ts").filter(col("ts").isNotNull)
      .localCheckpoint()
    val evK = scaled(ev, Seq("user_id"))
    def windowDistinct(e: DataFrame): DataFrame =
      e.groupBy((floor(col("ts").cast("double") / 3600).cast("long") * 3600)
            .as("window_es"), col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("en"))
        .groupBy("window_es", "event_type")
        .agg(count(lit(1)).as("n_users"), sum(col("en")).as("n_events"))
    report("g5 window-distinct",
      noop(windowDistinct(ev)), noop(windowDistinct(evK)))

    // f13/e7: the round-6 NARROW ops. Both are pure maps (no
    // exchange), so the probe pins the base property instead of a
    // shuffle key: cost scales on rows and nothing else — a ratio
    // near K with no super-linear term means the per-row HOF/codegen
    // work really is constant per row.
    report("f13 quality-gate",
      noop(Corpus.qualityGate(docs, "doc_id", "text")),
      noop(Corpus.qualityGate(docsK, "doc_id", "text")))
    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val embK = scaled(emb, Seq("vec_id"))
    report("e7 sign-projection",
      noop(graft.operators.Similarity.randomSignProjection(
        emb, "vec_id", "embedding", 16, 64)),
      noop(graft.operators.Similarity.randomSignProjection(
        embK, "vec_id", "embedding", 16, 64)))

    spark.stop()
  }
}
