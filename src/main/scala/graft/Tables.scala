package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Single place where test tables are read, so read options / schema
  * handling stay consistent across every operator.
  *
  * Tables are the driver-generated TPC-H-ish parquet files (see
  * TESTDATA.md). At cluster scale these reads would be partitioned
  * parquet/iceberg scans; all operators only depend on the DataFrame,
  * so the source can be swapped without touching them.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects by default; read it as nanos-since-epoch LongType
    // and convert to a proper timestamp column here, once. Our own
    // entry points (Bench/Verify/specs) set this in the session
    // builder; this fallback covers driver-owned sessions, and only
    // touches the conf when the value isn't already right (repeated
    // conf writes would be racy under concurrent query construction).
    if (!spark.conf.getOption(NanosKey).contains("true"))
      spark.conf.set(NanosKey, "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Upstream writers have shipped `events.ts` as TIMESTAMP(NANOS)
    * (read as nanos-in-LongType under nanosAsLong), TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ), and could ship a
    * UTC-adjusted TIMESTAMP. At 100 TB we don't control the writer's
    * physical type, so dispatch on the read schema and normalize all
    * three to TimestampType, interpreting naive wall clocks as UTC —
    * the same convention DuckDB's epoch(ts) uses on the naive
    * timestamps the oracle reads from these files.
    *
    * Both conversions are SESSION-INDEPENDENT on purpose:
    *  - nanos→micros uses integral FLOOR division (subtract the
    *    non-negative `pmod` remainder, then exact `div`): a long/long
    *    `/` promotes to double, whose 2^53 mantissa makes ~2e18 epoch
    *    nanos round by up to 256 ns, and a bare `div` truncates
    *    TOWARD ZERO — a pre-1970 nanos value with a sub-µs remainder
    *    would land 1 µs above the floor conversion DuckDB's native
    *    TIMESTAMP_NS read produces. Floor matches it on both sides of
    *    the epoch;
    *  - NTZ→LTZ goes through wall-clock microseconds since the NTZ
    *    epoch (`timestampdiff` on two NTZ operands is pure calendar
    *    arithmetic) rather than a cast, which would silently shift
    *    every event by the session zone's offset on any session that
    *    is not UTC (e.g. a driver-owned session on a laptop).
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", timestamp_micros(
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected nanos LongType, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
}
