package graft

import graft.functions.Hashes
import graft.functions.expr.KeccakUtil
import org.apache.spark.sql.functions._

/** Keccak-256 and EIP-137 namehash against published test vectors. */
class KeccakSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def hexOf(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("keccak256 matches published vectors") {
    assert(hexOf(KeccakUtil.keccak256(Array.empty[Byte])) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hexOf(KeccakUtil.keccak256("abc".getBytes("UTF-8"))) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // > one rate block (136 bytes) to exercise multi-block absorb.
    val long = Array.fill[Byte](200)('a'.toByte)
    assert(hexOf(KeccakUtil.keccak256(long)).length == 64)
  }

  test("namehash matches the EIP-137 vectors") {
    assert(hexOf(KeccakUtil.namehash("")) == "0" * 64)
    assert(hexOf(KeccakUtil.namehash("eth")) ==
      "93cdeb708b7545dc668eb9280176169d1c33cfd8ed6f04690a0bcc88a93fc4ae")
    assert(hexOf(KeccakUtil.namehash("foo.eth")) ==
      "de9b09fd7c5f901e23a3f19fecc54828e9c848539801e86591bd9801b019f84f")
  }

  test("column expression matches the driver-side implementation (codegen path)") {
    val df = Seq("eth", "foo.eth", "alice.wallet.eth").toDF("name")
    val rows = df.select($"name", lower(hex(Hashes.namehash($"name"))).as("nh"))
      .as[(String, String)].collect().toMap
    rows.foreach { case (name, nh) =>
      assert(nh == hexOf(KeccakUtil.namehash(name)), name)
    }
  }

  test("graft_keccak256 / graft_namehash callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT lower(hex(graft_keccak256('abc'))) AS k, lower(hex(graft_namehash('eth'))) AS n")
      .as[(String, String)].head()
    assert(got._1 == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(got._2 == "93cdeb708b7545dc668eb9280176169d1c33cfd8ed6f04690a0bcc88a93fc4ae")
  }
}
