package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bloom-filter prefilter (d13): the no-false-negative law, an exact
  * md5 position-math replay of the verdicts, the null-key contract,
  * and the bitmap's size bound. */
class BloomSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private val m = 1L << 16
  private val k = 5

  /** Text.hash64md5 replay: first 8 bytes of md5(utf8) as a signed
    * big-endian long. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }
  private def positions(key: String): Seq[Long] =
    (0 until k).map(i => Math.floorMod(md5Long(s"$key:$i"), m))

  test("bloom: inserted keys always probe maybe_present (no false negatives)") {
    val keys = (0 until 500).map(i => s"key-$i").toDF("key")
    val bits = Dedup.bloomBits(keys, "key", m, k)
    val bad = Dedup.bloomProbe(bits, keys, "key", m, k)
      .filter(!col("maybe_present")).count()
    assert(bad == 0)
  }

  test("bloom: absent-key verdicts replay the md5 position math; FP rate tiny") {
    val inserted = (0 until 500).map(i => s"key-$i")
    val absent = (0 until 500).map(i => s"other-$i")
    val bits = Dedup.bloomBits(inserted.toDF("key"), "key", m, k)
    val got = Dedup.bloomProbe(bits, absent.toDF("key"), "key", m, k)
      .as[(String, Boolean)].collect().toMap
    // The bitmap's word/mask packing and plain position-set membership
    // are the same predicate — replayed here key by key.
    val posSet = inserted.flatMap(positions).toSet
    for (key <- absent)
      assert(got(key) == positions(key).forall(posSet), key)
    // 500 keys x 5 hashes in 2^16 bits: load ~0.037, FP ~ 7e-8.
    val fp = got.count(_._2)
    assert(fp <= 5, s"false-positive count $fp")
  }

  test("bloom: null key probes as the empty string") {
    val bits = Dedup.bloomBits(Seq("").toDF("key"), "key", m, k)
    val got = Dedup.bloomProbe(bits,
        Seq[Option[String]](None).toDF("key"), "key", m, k)
      .select("maybe_present").as[Boolean].collect().toSeq
    assert(got == Seq(true))
  }

  test("bloom: duplicate probe rows collapse; probe columns pass through") {
    val bits = Dedup.bloomBits(Seq("a").toDF("key"), "key", m, k)
    val got = Dedup.bloomProbe(bits,
        Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "key"), "key", m, k)
    assert(got.columns.toSeq == Seq("id", "key", "maybe_present"))
    assert(got.count() == 2)
  }

  test("bloom: bitmap stays within mBits/64 words; bad sizing rejected") {
    val bits = Dedup.bloomBits(
      (0 until 2000).map(i => s"k$i").toDF("key"), "key", m, k)
    assert(bits.count() <= m / 64)
    intercept[IllegalArgumentException] {
      Dedup.bloomBits(Seq("x").toDF("key"), "key", mBits = 63L)
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomBits(Seq("x").toDF("key"), "key", kHashes = 0)
    }
  }
}
