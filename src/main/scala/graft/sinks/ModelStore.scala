package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence for FITTED SERVING STRUCTURES — the artifacts a daily
  * pipeline fits once and re-reads every ingest cycle: IVF centroids
  * and PQ codebooks ([[graft.operators.Similarity.ivfPqFit]] →
  * `ivfPqIndexDelta`), language-model count tables
  * ([[graft.operators.Corpus.unigramFit]]/`bigramFit` →
  * `perplexityBucketsWith`/`bigramNllWith`), the Bloom bitmap dim
  * ([[graft.operators.Dedup.bloomBits]] → `bloomProbe`), and the
  * component assignment [[graft.operators.Graph.componentsDelta]]
  * upserts. (The reference persists its equivalents as RocksDB maps
  * and cached JSONL between Airflow runs — collection-templates
  * airflow/dags; here the store is plain parquet, readable by any
  * engine.)
  *
  * The load side is a vanilla parquet scan, so reloaded dims behave
  * exactly like freshly-fitted frames — including BROADCAST
  * eligibility (file-sized stats are present without any checkpoint)
  * and, critically, the SCHEMA-METADATA STAMPS some structures carry
  * (the PQ (m, ds) geometry stamp, the bigram vocab stamp): Spark
  * stores the full Catalyst schema in the parquet footer and restores
  * it on read. A store that silently dropped the stamp would degrade
  * every downstream geometry check to pure trust, so [[save]]
  * VERIFIES survival — a guard against stamped columns landing in
  * hive partition directories (whose values come back from directory
  * names, metadata-less) and against format regressions — with one
  * footer read, zero Spark jobs.
  */
object ModelStore {

  private def stampedCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(f => f.metadata !=
      org.apache.spark.sql.types.Metadata.empty).map(_.name).toSeq

  /** Write a fitted structure under `path` (the store holds the
    * CURRENT model; version by path if history matters).
    * `partitionCols` routes through [[PartitionedParquet]] for the
    * rare corpus-scale dim (a billion-key bloom bitmap); the default
    * unpartitioned write is right for model-sized frames. Fails
    * loudly if any schema-metadata stamp would not survive the
    * round-trip.
    *
    * STAGE-AND-SWAP, not overwrite-in-place: the serving lifecycle
    * is load → fold a slice in → save to the SAME path, which means
    * `df`'s lazy plan may still be READING this path — a plain
    * overwrite would delete its own input mid-job (or be refused by
    * Spark's self-overwrite check). The new model therefore
    * materializes completely into a staging directory first (the
    * stamp check runs there too), and only then replaces the old
    * one — a failed write leaves the previous model intact, and the
    * replaced model survives at `path + ".__prev__"` (one extra
    * model-sized copy on disk) so even a failure INSIDE the swap
    * window leaves a recoverable full model next to the target.
    *
    * The swap is two directory renames, which are atomic on HDFS and
    * local filesystems — the filesystems this store assumes. On
    * object stores (S3A and friends) "rename" is copy+delete and NOT
    * atomic: a mid-rename failure can leave a partial target (the
    * previous model still intact at `.__prev__`), so serve from
    * VERSIONED paths plus a small pointer file there instead of
    * swapping in place. The swap is also not atomic for concurrent
    * readers on any filesystem; versioned paths likewise if readers
    * overlap writers. */
  def save(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
           sortCols: Seq[String] = Nil): Unit = {
    val stamped = stampedCols(df)
    require(partitionCols.intersect(stamped).isEmpty,
      s"stamped columns ${partitionCols.intersect(stamped).mkString(", ")} " +
        "cannot be hive partition columns — partition values are read back " +
        "from directory names and lose their schema metadata, silently " +
        "degrading downstream geometry verification to trust")
    val spark = df.sparkSession
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".__staging__")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery: a failure between the two swap renames below
    // leaves no live model at `path` but a complete one at
    // `.__prev__`. Standalone callers (outside ServingStore's
    // generation protocol) get automatic restoration here — BEFORE
    // the staging write, so even a failed new save leaves the
    // restored previous model serving.
    locally {
      val prev = new org.apache.hadoop.fs.Path(path + ".__prev__")
      if (!fs.exists(target) && fs.exists(prev)) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"ModelStore: no live model at $path but a retired one at $prev " +
            "(a crash between swap renames) — restoring it before saving")
        require(fs.rename(prev, target),
          s"could not restore the retired model: $prev -> $target")
      }
    }
    fs.delete(staging, true)
    if (partitionCols.nonEmpty)
      PartitionedParquet.write(df, staging.toString, partitionCols, sortCols)
    else df.write.mode("overwrite").parquet(staging.toString)
    // Survival check on the STAGED copy (footer metadata only — no
    // job, no data read), so a failed check never clobbers the
    // previous model.
    val back = spark.read.parquet(staging.toString).schema
    stamped.foreach { c =>
      val in = df.schema(c).metadata
      val out = back.fields.find(_.name == c).map(_.metadata)
      require(out.contains(in),
        s"schema-metadata stamp on column '$c' did not survive the parquet " +
          s"round-trip at $path (wrote $in, read back ${out.orNull}) — " +
          "downstream stamp verification would silently degrade to trust")
    }
    // Swap: retire the live model to `.__prev__` (kept — manual
    // recovery if anything fails between the two renames), then move
    // staging into place. Two renames, each atomic on HDFS/local.
    val prev = new org.apache.hadoop.fs.Path(path + ".__prev__")
    fs.delete(prev, true)
    if (fs.exists(target))
      require(fs.rename(target, prev),
        s"could not retire the live model: $target -> $prev")
    require(fs.rename(staging, target),
      s"could not move staged model into place: $staging -> $target")
  }

  /** Reload a fitted structure. Plain scan: stats-backed (broadcast
    * provable from file sizes), stamps restored from the footer. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
