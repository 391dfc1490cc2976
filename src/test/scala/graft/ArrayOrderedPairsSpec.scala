package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.expr.ArrayOrderedPairs

/** The native pair-emission kernel behind the bounded-df overlap path
  * (Relational.overlapPairs) — parity against the declarative
  * flatten(transform(sequence…slice…)) form it replaced (the a25
  * diet, r14 verdict ask #3), plus the Long specialization, the
  * generic element path, and the loud overflow guard. */
class ArrayOrderedPairsSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def pairsCol(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(ArrayOrderedPairs(ColumnBridge.expression(c)))

  /** The rejected declarative form — kept here as the parity oracle.
    * Guarded for size < 2 (sequence(0, -1) counts DOWN): the
    * production path filtered size >= 2 before applying it. */
  private def hofPairs(ids: org.apache.spark.sql.Column) =
    when(size(ids) < 2, array().cast("array<struct<id_a:long,id_b:long>>"))
      .otherwise(flatten(transform(
        sequence(lit(0), size(ids) - 2),
        i => transform(
          slice(ids, i + 2, size(ids) - i - 1),
          y => struct(ids(i).as("id_a"), y.as("id_b"))))))

  test("matches the declarative form on long arrays (the hot path)") {
    val df = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(10L, 20L),
      Seq(7L),
      Seq.empty[Long]).toDF("ids")
    val rows = df.select(
      pairsCol($"ids").as("fast"), hofPairs($"ids").as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) === r.getSeq[Any](1),
        s"pair sets diverge: $r")
    }
    // Shape pin: 4 elements -> 6 ordered pairs, lexicographic.
    val first = df.filter(size($"ids") === 4)
      .select(explode(pairsCol($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b").as[(Long, Long)].collect().toSeq
    assert(first === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
  }

  test("generic element path (strings) and null array") {
    val df = Seq(
      (1, Some(Seq("a", "b", "c"))),
      (2, None)).toDF("k", "ids")
    val out = df.select($"k", pairsCol($"ids").as("p")).collect()
    val withPairs = out.find(_.getInt(0) == 1).get
    assert(withPairs.getSeq[Any](1).size === 3)
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1),
      "null array must stay null")
    val pairs = df.filter($"k" === 1)
      .select(explode(pairsCol($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b").as[(String, String)].collect().toSeq
    assert(pairs === Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("null elements fall back off the long specialization, parity kept") {
    val df = Seq(Seq[java.lang.Long](1L, null, 3L)).toDF("ids")
    val pairs = df.select(explode(pairsCol($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b").collect().toSeq
    assert(pairs.size === 3)
    assert(pairs.count(r => r.isNullAt(0) || r.isNullAt(1)) === 2,
      "pairs touching the null element carry it through")
  }

  test("quadratic overflow fails loudly instead of truncating") {
    // 70k elements -> ~2.4B pairs > Int.MaxValue; the guard must name
    // the dfCap contract, not OOM or silently clip.
    val df = ss.range(1).select(
      sequence(lit(0L), lit(70000L)).as("ids"))
    val e = intercept[Exception] {
      df.select(pairsCol($"ids")).write.format("noop")
        .mode("overwrite").save()
    }
    assert(e.getMessage.contains("ordered_pairs") ||
      Option(e.getCause).exists(_.getMessage.contains("ordered_pairs")),
      s"expected the ordered_pairs guard, got: ${e.getMessage}")
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = ss.range(100).groupBy((col("id") % 10).as("g"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(pairsCol($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"),
      s"pair emission must not fall out of codegen\n$plan")
    // 10 groups x C(10,2) = 450 pairs.
    assert(df.count() === 450)
  }

  // ---- the STREAMED generator form (ArrayOrderedPairsGen, the r15
  // verdict's named a25 follow-up) — parity against the array form
  // above, which stays as the reference implementation.

  private def genPairs(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(graft.functions.expr.ArrayOrderedPairsGen(
      ColumnBridge.expression(c)))

  test("generator matches the array form on long arrays") {
    val df = Seq(
      Seq(1L, 2L, 3L, 4L, 5L),
      Seq(10L, 20L),
      Seq(7L),
      Seq.empty[Long]).toDF("ids")
    val viaGen = df.select(genPairs($"ids"))
      .as[(Long, Long)].collect().toSeq.sorted
    val viaArr = df.select(explode(pairsCol($"ids")).as("p"))
      .select($"p.id_a", $"p.id_b").as[(Long, Long)].collect().toSeq.sorted
    assert(viaGen === viaArr)
    // Order pin on one group: streamed emission is lexicographic,
    // exactly like the array form.
    val ordered = df.filter(size($"ids") === 5)
      .select(genPairs($"ids")).as[(Long, Long)].collect().toSeq
    assert(ordered === Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (2L, 4L), (2L, 5L), (3L, 4L), (3L, 5L), (4L, 5L)))
  }

  test("generator: generic path, null array, null elements") {
    val strs = Seq(
      (1, Some(Seq("a", "b", "c"))),
      (2, None)).toDF("k", "ids")
    // Null array generates NO rows (generator semantics; the callers
    // aggregate pair counts, where absent and null-array agree).
    val out = strs.select($"k", genPairs($"ids"))
      .collect().toSeq
    assert(out.forall(_.getInt(0) == 1) && out.size === 3)
    assert(out.map(r => (r.getString(1), r.getString(2))) ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    // A null element drops to the generic iterator; pairs carry it.
    val withNull = Seq(Seq[java.lang.Long](1L, null, 3L)).toDF("ids")
      .select(genPairs($"ids")).collect().toSeq
    assert(withNull.size === 3)
    assert(withNull.count(r => r.isNullAt(0) || r.isNullAt(1)) === 2)
  }

  test("generator: reused-row values survive downstream aggregation") {
    // The generator reuses ONE mutable row across all pairs of a
    // group — this pins that nothing downstream observes torn values:
    // per-pair counts over 10 groups x C(20,2) pairs must all be
    // exact after a hash aggregate (the production consumer shape).
    val df = ss.range(200).groupBy((col("id") % 10).as("g"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(genPairs($"ids"))
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
    val rows = df.collect()
    assert(rows.length === 10 * 190 && rows.forall(_.getLong(2) == 1L))
  }

  test("generator: overflow guard fires like the array form's") {
    val df = ss.range(1).select(
      sequence(lit(0L), lit(70000L)).as("ids"))
    val e = intercept[Exception] {
      df.select(genPairs($"ids")).write.format("noop")
        .mode("overwrite").save()
    }
    assert(e.getMessage.contains("ordered_pairs") ||
      Option(e.getCause).exists(_.getMessage.contains("ordered_pairs")),
      s"expected the ordered_pairs guard, got: ${e.getMessage}")
  }

  test("generator: GenerateExec consumed inside whole-stage codegen") {
    val df = ss.range(100).groupBy((col("id") % 10).as("g"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(genPairs($"ids"))
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
    // Execute THIS dataset first (collect, not count — count() builds
    // a different plan): under AQE the pre-execution plan string is
    // the unstarred skeleton (isFinalPlan=false) — codegen spans only
    // show on the final plan.
    assert(df.collect().length === 450)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected a Generate node\n$plan")
    assert(!plan.contains("CodegenFallback"),
      s"generator must not fall out of codegen\n$plan")
    // The Generate node must sit INSIDE a WholeStageCodegen span (the
    // codeGenIterableOnce path), not break the pipeline: in the tree
    // string a codegen'd operator is starred (*(n) Generate).
    assert(plan.contains("* Generate") || plan.matches(
      "(?s).*\\*\\(\\d+\\) Generate.*"),
      s"Generate must be whole-stage-codegen'd\n$plan")
  }
}
