package graft.tools

// Temporary profiling harness — not part of the library surface.
import graft.queries.GroupP
import graft.operators.{Graph, Relational}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val members = GroupP.membersOf(spark, sfDir)
    val entities = GroupP.entitiesOf(spark, sfDir)
    val collections = GroupP.collectionsOf(spark, sfDir)
    val typeEdges = GroupP.typeEdgesOf(spark, sfDir)
    val relations = GroupP.relationsOf(spark, sfDir)
    // warm
    time("warm-tables") {
      Seq(members, entities, collections, typeEdges, relations).foreach(_.count())
    }

    // ---- relation stage, piecewise
    val rel0 = relations.select(col("category_id"), col("list_id"))
    val soundAll = rel0
      .join(collections.select(col("collection_id").as("list_id")).distinct(), "list_id")
      .join(rel0.select(col("category_id").as("list_id")).distinct(), Seq("list_id"), "left_anti")
    val sound = Relational.firstByKey(soundAll,
      Seq(col("category_id")), Seq(col("list_id").asc))
    time("sound")(noop(sound))
    val merged = sound.groupBy("list_id").agg(min(col("category_id")).as("__min_cat"))
      .select(col("list_id"), least(col("list_id"), col("__min_cat")).as("new_id"))
    val remap = broadcast(
      sound.join(merged, "list_id")
        .select(col("category_id").as("old_id"), col("new_id"))
        .unionByName(merged.select(col("list_id").as("old_id"), col("new_id"))))
    time("remap")(noop(remap))
    val remappedMem = members
      .join(remap, members("collection_id") === remap("old_id"), "left")
      .withColumn("collection_id", coalesce(col("new_id"), col("collection_id")))
      .drop("old_id", "new_id")
    time("remappedMem")(noop(remappedMem))
    val survivors = collections
      .join(broadcast(sound.select(col("category_id"))),
            collections("collection_id") === col("category_id"), "left_anti")
      .join(remap, col("collection_id") === remap("old_id"), "left")
      .withColumn("collection_id", coalesce(col("new_id"), col("collection_id")))
      .drop("old_id", "new_id")
    time("survivors")(noop(survivors))
    val mem0 = Relational.firstByKey(remappedMem,
      Seq(col("collection_id"), col("member_id")), Seq(col("score").desc))
    time("mem0-dedup")(noop(mem0))
    val closure = time("closure") {
      Graph.reachableTo(
        typeEdges.select(col("src"), col("dst")),
        survivors.select(col("required_type").as("dst")),
        stride = 4)
    }
    time("closure-noop")(noop(closure))
    val typed = mem0.join(entities, "member_id").join(survivors, "collection_id")
    val validated = time("validated-checkpoint") {
      Graph.validateReachable(typed, closure, "member_type", "required_type").localCheckpoint()
    }
    val ranked = Relational.topKPerGroup(
      validated.filter(col("valid")),
      Seq(col("collection_id")),
      Seq(col("score").desc, col("member_id").asc), 5, "rank")
    val topMembers = ranked.groupBy("collection_id")
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("member_name")))),
        s => s.getField("member_name")).as("top_members"))
    time("topMembers")(noop(topMembers))
    val counts = validated.groupBy("collection_id")
      .agg(sum(when(col("valid"), 1L).otherwise(0L)).as("valid_cnt"),
           sum(when(col("valid"), 0L).otherwise(1L)).as("invalid_cnt"),
           max(when(col("valid"), col("score"))).as("rank"))
    time("counts")(noop(counts))
    val joined = survivors.select("collection_id", "collection_name")
      .join(counts, "collection_id")
      .join(topMembers, Seq("collection_id"), "left")
      .withColumn("top_members",
        coalesce(col("top_members"), array().cast("array<string>")))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("collection_name")
      .orderBy(col("rank").desc_nulls_last, col("collection_id").asc)
    val fin = joined.withColumn("__best", row_number().over(wBest) === 1)
      .groupBy(col("collection_name"))
      .agg(min(col("collection_id")).as("stable_id"),
           sum(col("valid_cnt")).as("valid_cnt"),
           sum(col("invalid_cnt")).as("invalid_cnt"),
           max(col("rank")).as("rank"),
           max_by(col("top_members"), col("__best").cast("int")).as("top_members"))
    time("final")(noop(fin))
    time("whole-build") {
      noop(graft.operators.Collections.build(members, entities, collections,
        typeEdges, topK = 5, relations = Some(relations)))
    }
    spark.stop()
  }
}
