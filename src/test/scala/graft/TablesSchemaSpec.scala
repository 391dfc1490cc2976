package graft

import org.apache.spark.sql.types._

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed physical types once (events.ts went
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between r5 and r6, which
  * surfaced as 28 scattered spec failures). This suite pins the
  * post-Tables logical schema of every table so the next upstream
  * change fails HERE, in one named spec, instead of across the tree.
  */
class TablesSchemaSpec extends GraftSuite {
  private val ss = SparkTestBase.spark

  private def fields(name: String): Map[String, DataType] =
    Tables(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events.ts normalizes to TimestampType regardless of physical type") {
    val f = fields("events")
    assert(f("ts") === TimestampType, s"events.ts drifted: ${f("ts")}")
    assert(f.contains("event_id") && f.contains("user_id") && f.contains("event_type"))
  }

  test("events.ts values are sane epoch range after normalization") {
    import org.apache.spark.sql.functions._
    val r = Tables(spark, sfDir, "events")
      .agg(min(col("ts").cast("long")).as("lo"), max(col("ts").cast("long")).as("hi"))
      .head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // 2000-01-01 .. 2100-01-01 epoch seconds: a mis-scaled conversion
    // (nanos treated as micros, micros as seconds, ...) lands far outside.
    assert(lo > 946684800L && hi < 4102444800L, s"ts epoch range off: [$lo, $hi]")
  }

  test("embeddings are 64-dim, non-null, with ids covering the query contracts") {
    import org.apache.spark.sql.functions._
    // Every vector entry point takes dim as trusted caller metadata,
    // and the registered E/D queries pass 64 — a regenerated
    // embeddings table with a different dimension (or null vectors,
    // or an id space missing the %37 centroid seeds / %50 query set /
    // %10 slice) must fail HERE as one named canary, not as scattered
    // wrong-recall or empty-seed errors across the E family.
    val e = Tables(spark, sfDir, "embeddings")
    val r = e.agg(
      count(lit(1)).as("n"),
      count(when(col("embedding").isNull, 1)).as("nulls"),
      min(size(col("embedding"))).as("dmin"),
      max(size(col("embedding"))).as("dmax"),
      count(when(col("vec_id") % 37 === 0 && col("vec_id") % 10 =!= 0, 1))
        .as("seeds"),
      count(when(col("vec_id") % 50 === 0, 1)).as("queries"),
      count(when(col("vec_id") % 10 === 0, 1)).as("slice")).head()
    assert(r.getLong(1) == 0L, s"null embeddings: ${r.getLong(1)}")
    assert(r.getInt(2) == 64 && r.getInt(3) == 64,
      s"embedding dim drifted: [${r.getInt(2)}, ${r.getInt(3)}] != 64 — " +
        "update the dim = 64 contracts in GroupD/GroupE and the oracles")
    assert(r.getLong(4) > 0L, "no ids for the %37 centroid seeds (old slice)")
    assert(r.getLong(5) > 0L, "no ids for the %50 query set")
    assert(r.getLong(6) > 0L, "no ids for the %10 daily slice")
  }


  test("legacy nanos-as-long events files still convert (LongType branch)") {
    // The regenerated testdata no longer exercises the legacy
    // TIMESTAMP(NANOS) read path (nanos-in-LongType under
    // nanosAsLong), but upstream writers shipped it for five rounds
    // and can ship it again — pin the branch with a synthetic file.
    // The nanos value is deliberately NOT double-representable
    // (~2e18 > 2^53): a float division by 1000 would round it by up
    // to 256 ns and land on the wrong microsecond; integral div must
    // not.
    import org.apache.spark.sql.functions._
    import ss.implicits._
    withTempDir("graft-nanos-") { dir =>
      val wallMicros = 1700000000000000L // 2023-11-14T22:13:20 UTC
      // Row 2 is PRE-EPOCH with a non-zero sub-µs remainder: the
      // conversion must FLOOR (to -5 µs), matching DuckDB's native
      // TIMESTAMP_NS read — a truncating div would land on -4 µs.
      Seq((1L, wallMicros * 1000L + 999L, 7L, "view", 1.0, "{}"),
          (2L, -4001L, 7L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Tables(spark, dir, "events")
      assert(got.schema("ts").dataType === TimestampType)
      val micros = got.orderBy(col("event_id"))
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(micros === Seq(wallMicros, -5L),
        s"nanos->micros conversion drifted: $micros != Seq($wallMicros, -5)")
    }
  }

  test("events.ts normalization is independent of the session time zone") {
    // A driver-owned session is not guaranteed to run with
    // spark.sql.session.timeZone=UTC; a cast-based NTZ→LTZ conversion
    // would shift every event by the zone offset there. The
    // wall-clock-arithmetic conversion must yield identical epochs
    // under any session zone.
    import org.apache.spark.sql.functions._
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    val utc = Tables(spark, sfDir, "events")
      .agg(sum(unix_micros(col("ts"))), count(lit(1))).head()
    try {
      spark.conf.set(key, "America/Los_Angeles")
      val la = Tables(spark, sfDir, "events")
        .agg(sum(unix_micros(col("ts"))), count(lit(1))).head()
      assert(la === utc,
        s"ts epochs drift with the session zone: $la != $utc")
    } finally spark.conf.set(key, saved)
  }

  test("an unsupported events.ts physical type fails loudly, not downstream") {
    import ss.implicits._
    withTempDir("graft-badts-") { dir =>
      Seq((1L, "2023-11-14", 7L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[IllegalStateException](Tables(spark, dir, "events"))
      assert(e.getMessage.contains("unsupported physical type"))
    }
  }

  test("all tables load and keep their pinned column types") {
    val pinned: Map[String, Map[String, DataType]] = Map(
      "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
                        "n_name" -> StringType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
                        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
                        "s_acctbal" -> DoubleType),
      "part"     -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
                        "p_retailprice" -> DoubleType),
      "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                        "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
                        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
                        "l_returnflag" -> StringType, "l_shipdate" -> TimestampNTZType),
      "events"   -> Map("event_id" -> LongType, "ts" -> TimestampType,
                        "user_id" -> LongType, "event_type" -> StringType,
                        "value" -> DoubleType, "props" -> StringType),
      "documents"  -> Map("doc_id" -> LongType, "text" -> StringType,
                          "lang" -> StringType, "source" -> StringType,
                          "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType,
                          "embedding" -> ArrayType(FloatType, containsNull = true))
    )
    val drift = for {
      (table, cols) <- pinned.toSeq
      actual = fields(table)
      (col, want) <- cols.toSeq
      got = actual.get(col)
      if !got.contains(want)
    } yield s"$table.$col: expected $want, got ${got.getOrElse("<missing>")}"
    assert(drift.isEmpty, "schema drift detected:\n" + drift.mkString("\n"))
  }
}
