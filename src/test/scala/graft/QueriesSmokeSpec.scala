package graft

import org.apache.spark.sql.execution.SparkPlan

/** Every registered query runs on sf0.001 and returns rows; spot plan
  * checks that the intended physical strategy was actually picked.
  */
class QueriesSmokeSpec extends GraftSuite {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle is registered, and vice versa") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without query: ${os -- qs}")
  }

  test("SURVEY §2 checklist rows and SparkEntry.queries cannot drift") {
    // The §2 table is the coverage contract the engine is graded
    // against; r6 shipped a registered, oracled query (f22) with no
    // checklist row. Pin the two sets to each other: every §2 table
    // row's backticked key is registered, and every registered query
    // has a row.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val s2 = survey.split("## §3")(0).split("## §2")(1)
    val rowKey = """(?m)^\| `([a-z]\d+[a-z0-9_]*)` \|""".r
    val rows = rowKey.findAllMatchIn(s2).map(_.group(1)).toSet
    val qs = SparkEntry.queries.keySet
    assert((rows -- qs).isEmpty, s"SURVEY §2 rows with no query: ${rows -- qs}")
    assert((qs -- rows).isEmpty, s"queries with no SURVEY §2 row: ${qs -- rows}")
  }

  private def physical(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  test("a2 uses a broadcast hash join (dim side broadcast)") {
    assert(physical("a2_join_broadcast").toString.contains("BroadcastHashJoin"))
  }

  test("a4 semi join stays broadcast and pushes the size filter to the scan") {
    val p = physical("a4_semijoin_allowlist").toString
    assert(p.contains("LeftSemi"))
    assert(p.contains("LessThan(p_size,15)") && p.contains("PushedFilters"),
      s"size filter not pushed:\n$p")
  }

  test("a3 prunes columns at the orders scan") {
    val p = physical("a3_join_multiway").toString
    // o_orderstatus / o_totalprice readSchema must not include unused cols
    assert(!p.contains("o_orderpriority"), "orders scan reads unused column")
  }
}
