package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Proof of the SURVEY §5 co-location claim: facts bucketed on the
  * join key join WITHOUT any shuffle — the physical plan contains no
  * Exchange on either side. At 100 TB this is the difference between
  * re-shuffling both fact tables per join and reading co-located
  * buckets straight off storage.
  */
class BucketingSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  test("bucketed fact-fact join plans with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // The in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist; clear them so CREATE never sees a
    // stale location.
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    for (t <- Seq("li_b", "ord_b")) {
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy("l_orderkey")
      .agg(sum($"l_quantity").as("qty"), first($"o_totalprice").as("price"))

    // Disable auto-broadcast so the join would otherwise shuffle.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"bucketed join + same-key agg must not shuffle, found: $exchanges\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
