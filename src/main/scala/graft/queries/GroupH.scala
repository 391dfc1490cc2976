package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group H — the multimodal decode path under the machine oracle: the
  * REAL JDK codecs ([[Media.decodeImageStats]] via `javax.imageio`,
  * [[Media.decodeAudioStats]] via `javax.sound.sampled`) run over the
  * committed fixture payloads, and the DuckDB oracle reads the
  * expected features an independent pure-Python implementation
  * computed for the same payloads (tools/gen_media_fixtures.py — the
  * a23 expected-vectors pattern). A hash match proves decode
  * dimensions, channel means, PCM metadata and RMS bit-for-bit
  * (float32 arithmetic replicated exactly on both sides), and that
  * corrupt payloads surface as all-null rows rather than dead tasks.
  * (Reference has no codec analogue — this family is the
  * training-data-pipeline extension; the sibling plumbing stays
  * spec-covered in MediaSpec.)
  */
object GroupH {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // h1: decode features of the committed PNG/WAV/corrupt fixtures.
    // Both decoders run over ALL rows (each nulls out payloads it
    // cannot parse — the declared contract), one narrow join on the
    // fixture name glues image and audio features into one row per
    // payload. sfDir is unused by design: the corpus tables cannot
    // carry real encoded media, and the point of h1 is the codec
    // path, not the scan.
    "h1_media_decode" -> ((s, _) => {
      val fx = s.read.parquet(Media.fixturesPathChecked)
      val img = Media.decodeImageStats(fx)
        .select(col("name"), col("kind"), col("img_width"), col("img_height"),
          element_at(col("mean_rgb"), 1).cast("double").as("mean_r"),
          element_at(col("mean_rgb"), 2).cast("double").as("mean_g"),
          element_at(col("mean_rgb"), 3).cast("double").as("mean_b"))
      val aud = Media.decodeAudioStats(fx)
        .select(col("name"),
          col("sample_rate").cast("double").as("sample_rate"),
          col("n_channels"), col("n_samples"),
          col("rms").cast("double").as("rms"))
      img.join(aud, "name")
    }),
  )

  // Lazy, not eager: the expectedPathChecked existence check (a
  // named-knob WARN — building the map must never throw, or one
  // missing media fixture takes every unrelated oracle down) runs
  // only for consumers that BUILD the oracle SQL (Verify) — a Bench
  // session launched outside the checkout root never reads oracles
  // and must not even log about fixtures in GroupH's object init.
  // `lazy val` (not `def`) so a per-query or per-pass consumer stats
  // the fixture and logs the WARN at most once (round-11 advice).
  lazy val oracles: Map[String, String] = Map(
    // The oracle is a pure read of the independently-computed
    // expected features — the Spark side must reproduce every value
    // through the real codecs for the hash to match.
    "h1_media_decode" ->
      s"""SELECT name, kind, img_width, img_height, mean_r, mean_g, mean_b,
         |  sample_rate, n_channels, n_samples, rms
         |FROM read_parquet('${Media.expectedPathChecked}')""".stripMargin,
  )
}
