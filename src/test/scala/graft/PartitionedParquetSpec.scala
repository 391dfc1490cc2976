package graft

import graft.sinks.PartitionedParquet
import org.apache.spark.sql.functions._

/** The write-side layout contract: partition dirs exist, file count
  * per partition is bounded by filesPerPartition (no task×partition
  * small-file explosion), content round-trips, layout is rerun-stable.
  */
class PartitionedParquetSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("partitioned write bounds files per partition and round-trips") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", ($"doc_id" % 5).cast("int").as("shard"))
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-ppq-${System.nanoTime()}")
    try {
      PartitionedParquet.write(docs, out.getAbsolutePath,
        partitionCols = Seq("shard"), sortCols = Seq("doc_id"),
        filesPerPartition = 2)

      val shards = out.listFiles().filter(_.getName.startsWith("shard="))
      assert(shards.map(_.getName).sorted.toSeq ==
        (0 until 5).map(i => s"shard=$i"))
      for (dir <- shards) {
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length >= 1 && files.length <= 2,
          s"${dir.getName}: ${files.length} files, want <= filesPerPartition")
      }

      val back = spark.read.parquet(out.getAbsolutePath)
        .select($"doc_id", $"text", $"shard").as[(Long, String, Int)]
        .collect().toSet
      val want = docs.as[(Long, String, Int)].collect().toSet
      assert(back == want)

      // The layout pays off at read time: a partition-key filter must
      // prune to the one matching directory (partition pruning visible
      // in the scan, no full-table read).
      val pruned = spark.read.parquet(out.getAbsolutePath).filter($"shard" === 3)
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("shard"),
        s"partition filter must reach the scan\n$scan")
      assert(pruned.count() ==
        docs.filter($"shard" === 3).count())

      // Deterministic salt → rerun produces the identical layout.
      val firstLayout = shards.map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      PartitionedParquet.write(docs, out.getAbsolutePath,
        partitionCols = Seq("shard"), sortCols = Seq("doc_id"),
        filesPerPartition = 2)
      val again = out.listFiles().filter(_.getName.startsWith("shard=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      assert(again == firstLayout)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(out)
    }
  }
}
