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

    // h2: the resize path under the hash gate — decode → Graphics2D
    // bilinear scale to 8x6 → PNG re-encode → re-decode. The fixtures
    // are SOLID-COLOR images on purpose: any convex resampling of a
    // constant image is that constant, so the expected post-resize
    // channel means are resampler-independent (nothing outside the
    // JDK could replicate AWT's kernel bit-for-bit) while the gate
    // still proves both codec directions, the original-dimension
    // passthrough, the target dimensions, and the corrupt-payload
    // null contract. Target dims 8x6 must match the generator's
    // RESIZE_W/RESIZE_H (tools/gen_media_fixtures.py).
    "h2_media_resize" -> ((s, _) => {
      val fx = s.read.parquet(Media.resizeFixturesPathChecked)
      Media.decodeImageStats(Media.resizeImages(fx, 8, 6))
        .select(col("name"), col("orig_width"), col("orig_height"),
          col("img_width").as("out_width"),
          col("img_height").as("out_height"),
          element_at(col("mean_rgb"), 1).cast("double").as("mean_r"),
          element_at(col("mean_rgb"), 2).cast("double").as("mean_g"),
          element_at(col("mean_rgb"), 3).cast("double").as("mean_b"))
    }),

    // h3: declarative frame sampling over the synthetic media corpus
    // (the one H row that scales with the tables): every 3rd frame of
    // each payload, sliced by binary substring inside codegen — no
    // UDF, no mapPartitions. Frames surface as lowercase hex so the
    // BLOB slice itself sits under the value hash (DuckDB cannot
    // substring BLOBs — the oracle slices the hex string at 2 chars
    // per byte, byte-equivalent by construction).
    "h3_frame_sample" -> ((s, d) => {
      val docs = graft.Tables(s, d, "documents")
      Media.frameSample(Media.syntheticMedia(docs), everyN = 3)
        .select(col("id"), col("frame_no").cast("int").as("frame_no"),
          lower(hex(col("frame_bytes"))).as("frame_hex"))
    }),

    // h4: the REAL weight-file embedder under the hash gate — the
    // committed GFTW artifact loaded per-executor through the
    // @transient lazy handle, applied over every fixture payload
    // (byte-histogram features, float64 accumulation in ascending
    // index), exploded to one row per (payload, dimension). The
    // oracle reads the expected embeddings an independent pure-Python
    // implementation computed for the same payloads
    // (tools/gen_linear_embedder.py) — the full model-artifact
    // deployment path (file → executor → batch API → vectors) is
    // machine-oracled, not just spec-covered.
    "h4_media_embed" -> ((s, _) => {
      val fx = s.read.parquet(Media.fixturesPathChecked)
      Media.decodeFeatures(fx, dim = 8,
          embedder = new Media.LinearEmbedder(Media.linearModelPath))
        .select(col("name"), posexplode(col("features")))
        .select(col("name"), col("pos").cast("int").as("idx"),
          col("col").cast("double").as("feature"))
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

    "h2_media_resize" ->
      s"""SELECT name, orig_width, orig_height, out_width, out_height,
         |  mean_r, mean_g, mean_b
         |FROM read_parquet('${Media.resizeExpectedPathChecked}')""".stripMargin,

    // Replays frameSample's arithmetic exactly: n_frames = doc_id%8+1
    // (syntheticMedia), frame_size = max(floor(bytes/n_frames), 1),
    // frames 0, 3, 6, … — slicing the hex rendering at 2 chars/byte
    // because DuckDB's substring is VARCHAR-only.
    "h3_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS id, lower(hex(encode(text))) AS mediahex,
        |         CAST(doc_id % 8 + 1 AS INT) AS n_frames,
        |         octet_length(encode(text)) AS nbytes
        |  FROM documents
        |), f AS (
        |  SELECT id, mediahex, n_frames,
        |         CAST(GREATEST(CAST(FLOOR(nbytes / n_frames) AS BIGINT), 1)
        |              AS INT) AS frame_size
        |  FROM m
        |)
        |SELECT id, CAST(fn AS INT) AS frame_no,
        |       substring(mediahex, fn*frame_size*2+1, frame_size*2)
        |         AS frame_hex
        |FROM f, unnest(generate_series(0, n_frames-1, 3)) AS t(fn)""".stripMargin,

    "h4_media_embed" ->
      s"""SELECT name, CAST(i - 1 AS INT) AS idx,
         |  CAST(features[i] AS DOUBLE) AS feature
         |FROM read_parquet('${Media.linearExpectedPathChecked}'),
         |  generate_series(1, 8) AS t(i)""".stripMargin,
  )
}
