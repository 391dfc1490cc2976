package graft

import graft.operators.{Corpus, Dedup, Sampling, Similarity}
import graft.sinks.PartitionedParquet
import org.apache.spark.sql.functions._

/** The README "Quickstart" example, executed on the sf0.001 testdata
  * so the documented flow (read → dedup → ANN → budget/sample →
  * partitioned write) is a COMPILING, passing program — if an API in
  * the README drifts, this spec breaks, not a user.
  */
class QuickstartSpec extends GraftSuite {

  test("README quickstart: read -> dedup -> ANN -> select -> write") {
    // 1 — read (the README reads s3 paths; same columns here).
    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")

    // 2 — near-dup dedup: MinHash-LSH candidate pairs, canonical cut.
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, rows = 4, minEstJaccard = 0.5, dfCap = 10000L)
    val deduped = Dedup.keepCanonical(docs, pairs, "doc_id")
    val nDocs = docs.count()
    val nKept = deduped.count()
    assert(nKept > 0 && nKept <= nDocs)

    // 3 — ANN: fit serving structures once, persist via ModelStore,
    // reload and assign a daily slice with no refit; search via LSH.
    // dim is caller metadata (64 here).
    val (centroids, codebook) =
      Similarity.ivfPqFit(emb, "vec_id", "embedding", dim = 64, m = 8)
    val slice = emb.filter(col("vec_id") % 10 === 0)
    withTempDir("graft-quickstart-models-") { dir =>
      graft.sinks.ModelStore.save(centroids, s"$dir/ivf-centroids")
      graft.sinks.ModelStore.save(codebook, s"$dir/pq-codebook")
      val delta = Similarity.ivfPqIndexDelta(slice, "vec_id", "embedding",
        graft.sinks.ModelStore.load(spark, s"$dir/ivf-centroids"),
        graft.sinks.ModelStore.load(spark, s"$dir/pq-codebook"),
        m = 8, dim = 64)
      assert(delta.count() == slice.count())
    }
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val neighbors = Similarity.knnLsh(queries, emb, "vec_id", "embedding",
      k = 10, dim = 64)
    assert(neighbors.count() > 0)

    // 4 — training-mix selection: token budget, then stratified rates.
    val keptIds = Corpus.tokenBudgetSelect(deduped, "doc_id", "text",
      budgetTokens = 50000L)
    val selected = deduped.join(
      keptIds.select(col("id").as("doc_id")), "doc_id")
    val sampled = Sampling.stratifiedSample(selected, col("doc_id"),
      col("lang"), rates = Map("en" -> 50), defaultRate = 20)
    val nSampled = sampled.count()
    assert(nSampled > 0)

    // 5 — bounded-file-count partitioned write.
    withTempDir("graft-quickstart-") { dir =>
      val out = s"$dir/train"
      PartitionedParquet.write(sampled, out,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      assert(spark.read.parquet(out).count() == nSampled)
    }
  }
}
