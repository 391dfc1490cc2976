package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** The native ArrayDot expression: value parity with the
  * higher-order-function formulation, float/double inputs, null
  * handling, and SQL registration via GraftExtensions.
  */
class ArrayDotSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the higher-order-function dot on float arrays") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.5f, -0.5f), Seq(2.0f, 2.0f)),
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val rows = df.select(
      Vectors.dot($"a", $"b").as("fast"),
      hofDot($"a", $"b").as("ref")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("works on double arrays and mixed types") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(Vectors.dot($"a", $"b")).as[Double].head() == 11.0)
    // float × double
    val m = Seq((Seq(2.0f, 3.0f), Seq(10.0, 100.0))).toDF("a", "b")
    assert(m.select(Vectors.dot($"a", $"b")).as[Double].head() == 320.0)
  }

  test("null array yields null; null elements are skipped") {
    val df = Seq(
      (Some(Seq(Some(1.0f), None, Some(3.0f))), Some(Seq(Some(1.0f), Some(1.0f), Some(1.0f)))),
      (None, Some(Seq(Some(1.0f)))))
      .toDF("a", "b")
    val out = df.select(Vectors.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 4.0)
    assert(out(1).isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    val df = Seq((Seq(1.5f, -2.5f, 3.0f), Seq(2.0f, 4.0f, -1.0f))).toDF("a", "b")
    // Force the interpreted path through a non-codegen context: eval on
    // the driver via expression.eval with literal inputs.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val lit1 = Literal.create(Array(1.5f, -2.5f, 3.0f),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val lit2 = Literal.create(Array(2.0f, 4.0f, -1.0f),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interpreted = graft.functions.expr.ArrayDot(lit1, lit2).eval(null)
      .asInstanceOf[Double]
    val codegen = df.select(Vectors.dot($"a", $"b")).as[Double].head()
    assert(math.abs(interpreted - codegen) < 1e-9)
    assert(math.abs(interpreted - (-10.0)) < 1e-9)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(out == 11.0)
  }

  test("graft_shingles is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT graft_shingles(array('a', 'b', 'c', 'd'), 3) AS s")
      .as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
    // short array → empty, never null
    val short = spark.sql("SELECT graft_shingles(array('a'), 3) AS s")
      .as[Seq[String]].head()
    assert(short == Seq.empty)
    // literal NULL (NullType) must analyze and follow the null-array
    // contract — empty array, not an analysis error (round-5 ADVICE).
    val nul = spark.sql("SELECT graft_shingles(NULL, 3) AS s")
      .as[Seq[String]].head()
    assert(nul == Seq.empty)
  }

  test("graft_simhash and graft_minhash are callable from SQL") {
    GraftExtensions.register(spark)
    // SQL-only route to the dedup family: simhash as an aggregate,
    // minhash as a scalar signature.
    val fp = spark.sql(
      """SELECT graft_simhash(xxhash64(t)) AS fp
        |FROM VALUES ('a'), ('b'), ('a') AS v(t)""".stripMargin)
      .as[Long].head()
    val expected = Seq("a", "b", "a").toDF("t")
      .groupBy().agg(graft.functions.Hashes.simhash(xxhash64($"t")))
      .as[Long].head()
    assert(fp === expected)
    val sig = spark.sql(
      "SELECT graft_minhash(array('x y z', 'y z w'), 4) AS s")
      .as[Seq[Long]].head()
    assert(sig.length === 4)
    val direct = Seq((Seq("x y z", "y z w"))).toDF("sh")
      .select(graft.functions.Hashes.minhashSig($"sh", 4))
      .as[Seq[Long]].head()
    assert(sig === direct)
  }
}
