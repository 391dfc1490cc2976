package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Layout-conscious partitioned parquet output — the write side of the
  * 100 TB posture. A naive `df.write.partitionBy(...)` lets EVERY task
  * hold a writer into EVERY hive partition it sees rows for: with T
  * tasks and P partitions that is up to T × P output files (the
  * classic small-file explosion) and T × P open writers' worth of
  * memory. Clustering rows by partition key first bounds both.
  *
  * (The reference materializes JSONL between stages —
  * collection-templates Makefile/airflow dags — so output hygiene is
  * an engine responsibility here, not an afterthought.)
  */
object PartitionedParquet {

  /** Write `df` under `path` hive-partitioned by `partitionCols`:
    *
    *  - rows are clustered on (partition cols, deterministic salt in
    *    [0, filesPerPartition)) so each hive partition is produced by
    *    at most `filesPerPartition` tasks → at most that many files
    *    (plus `maxRecordsPerFile` roll-overs, which bound the other
    *    extreme — one giant file);
    *  - within each task rows sort by (partition cols, `sortCols`) so
    *    writers open one partition at a time and column runs compress
    *    (rank-ordered members, time-ordered events);
    *  - the salt is a hash of the whole row, not `rand()`: re-running
    *    the write assigns every row to the SAME file deterministically.
    *    (File assignment is deterministic; byte-identical files
    *    additionally require `sortCols` to form a unique key within a
    *    partition — rows tied on the whole sort key keep shuffle
    *    arrival order, which varies run to run.)
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            sortCols: Seq[String] = Nil, filesPerPartition: Int = 4,
            maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    // 0 would make pmod(_, 0) a null salt (one task per hive
    // partition — the giant-task pathology this class exists to
    // prevent) under default mode, or DIVIDE_BY_ZERO under ANSI.
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1, got $filesPerPartition")
    require(df.columns.distinct.length == df.columns.length,
      s"duplicate column names (common after joins) make the salt ambiguous: " +
        df.columns.diff(df.columns.distinct).mkString(", "))
    require(!df.columns.contains("__file_salt"),
      "input already has a __file_salt column; rename it before writing")
    // Salt from the hashable columns only — xxhash64 rejects MapType
    // (map ordering is undefined), and partition cols alone would be
    // constant within a partition. Parquet-writable inputs whose every
    // non-partition column is a map still cluster by partition cols.
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    // Backtick-quoted: these names come from the schema, not the
    // caller, so a column literally named "user.id" must resolve as
    // itself, never as a nested-field reference (r12 review).
    val hashable = df.schema.fields
      .filter(f => !hasMap(f.dataType))
      .map(f => col("`" + f.name.replace("`", "``") + "`"))
    val salt =
      (if (hashable.isEmpty) lit(0L)
       else pmod(xxhash64(struct(hashable.toSeq: _*)), lit(filesPerPartition.toLong)))
        .as("__file_salt")
    df.withColumn("__file_salt", salt)
      .repartition((partitionCols :+ "__file_salt").map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("__file_salt")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
