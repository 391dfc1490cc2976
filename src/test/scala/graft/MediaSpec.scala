package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: schema, batch shape, determinism, frame
  * sampling — the parts that stay real around the stubbed decode.
  */
class MediaSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private lazy val media = Media.syntheticMedia(Tables(spark, sfDir, "documents"))

  test("synthetic media has the contract schema (id, media binary, meta struct)") {
    val s = media.schema
    assert(s("media").dataType == BinaryType)
    assert(s("meta").dataType == Media.metaType)
  }

  test("decodeFeatures appends fixed-dim features and preserves rows") {
    val out = Media.decodeFeatures(media, dim = 8, batchSize = 16)
    assert(out.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    assert(out.count() == media.count())
    assert(out.filter(size($"features") =!= 8).count() == 0)
  }

  test("decodeFeatures is deterministic and content-keyed") {
    val a = Media.decodeFeatures(media, dim = 4, batchSize = 7)
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    val b = Media.decodeFeatures(media.repartition(5), dim = 4, batchSize = 64)
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    // Same rows, same features, regardless of partitioning / batch size.
    assert(a == b)
  }

  test("decodeImageStats really decodes PNGs and nulls non-images") {
    // Solid-color PNGs rendered with the same JDK codec the decoder
    // uses: decode must recover exact dimensions and channel means.
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(4, 3, 0xff0000), "image"),      // solid red
      (2L, png(2, 5, 0x00ff00), "image"),      // solid green
      (3L, "not an image".getBytes("UTF-8"), "audio"),
      (4L, null.asInstanceOf[Array[Byte]], "missing"))   // null payload
    val df = rows.toDF("id", "media", "kind")
    val out = Media.decodeImageStats(df)
      .select($"id", $"img_width", $"img_height", $"mean_rgb")
      .as[(Long, Option[Int], Option[Int], Option[Seq[Float]])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((Some(4), Some(3), Some(Seq(1f, 0f, 0f)))))
    assert(out(2L) == ((Some(2), Some(5), Some(Seq(0f, 1f, 0f)))))
    assert(out(3L) == ((None, None, None)), "non-image payloads must null out")
    assert(out(4L) == ((None, None, None)), "null payloads must null out, not crash")
  }

  test("resizeImages re-encodes to the target size and nulls non-images") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(8, 6, 0x0000ff), "image"),
      (2L, "junk".getBytes("UTF-8"), "junk"),
      (3L, null.asInstanceOf[Array[Byte]], "missing")).toDF("id", "media", "kind")
    val out = Media.resizeImages(df, 4, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("media"), r.getAs[Any]("orig_width"),
          r.getAs[Any]("orig_height")))).toMap
    // The resized payload must itself decode to exactly 4x4 and keep
    // the solid color (bilinear over a constant field is constant).
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)._1))
    assert(resized.getWidth == 4 && resized.getHeight == 4)
    assert((resized.getRGB(2, 2) & 0xffffff) == 0x0000ff)
    assert(out(1L)._2 == 8 && out(1L)._3 == 6)
    assert(out(2L)._1 == null && out(2L)._2 == null, "junk must null out")
    assert(out(3L)._1 == null, "null payload must pass through as null")
  }

  test("decodeAudioStats really decodes WAV PCM and nulls non-audio") {
    // A 440 Hz full-scale sine written with the same JDK codec the
    // decoder reads: format metadata must round-trip exactly and the
    // RMS must land at amplitude/sqrt(2).
    def wav(hz: Double, amp: Double, rate: Float, nSamples: Int): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until nSamples)
        bb.putShort((math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toShort)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wav(440, 1.0, 8000f, 8000)),            // 1 s full-scale sine
      (2L, wav(100, 0.5, 16000f, 4000)),           // quieter, other rate
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val out = Media.decodeAudioStats(rows.toDF("id", "media"))
      .select($"id", $"sample_rate", $"n_channels", $"n_samples", $"rms")
      .as[(Long, Option[Float], Option[Int], Option[Long], Option[Float])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L)._1.contains(8000f) && out(1L)._2.contains(1) &&
      out(1L)._3.contains(8000L))
    assert(math.abs(out(1L)._4.get - 1.0 / math.sqrt(2)) < 0.01,
      s"full-scale sine RMS ${out(1L)._4}")
    assert(math.abs(out(2L)._4.get - 0.5 / math.sqrt(2)) < 0.01,
      s"half-scale sine RMS ${out(2L)._4}")
    assert(out(3L) == ((None, None, None, None)), "non-audio must null out")
    assert(out(4L) == ((None, None, None, None)), "null payload must null out")
  }

  test("decodeAudioStats: unknown-length AU still yields RMS (n_samples null)") {
    // AU header with the 0xFFFFFFFF unknown-size field: the container
    // reports frame length NOT_SPECIFIED but the PCM16 stream decodes
    // fine — the RMS walk must not be gated on the declared length.
    val nSamples = 4000
    val bb = java.nio.ByteBuffer.allocate(24 + nSamples * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(0xFFFFFFFF)
      .putInt(3 /* 16-bit linear PCM */).putInt(8000).putInt(1)
    for (i <- 0 until nSamples)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toShort)
    val out = Media.decodeAudioStats(Seq((1L, bb.array())).toDF("id", "media"))
      .select($"sample_rate", $"n_channels", $"n_samples", $"rms")
      .as[(Option[Float], Option[Int], Option[Long], Option[Float])].head()
    assert(out._1.contains(8000f) && out._2.contains(1))
    assert(out._3.isEmpty, s"unknown container length must yield null n_samples, got ${out._3}")
    assert(out._4.isDefined && math.abs(out._4.get - 1.0 / math.sqrt(2)) < 0.01,
      s"RMS must still be computed, got ${out._4}")
  }

  test("h2 premise: solid-color resize round-trips to EXACTLY the expected " +
    "constant means on the committed fixtures") {
    // The h2 gate's whole design rests on one invariant: any convex
    // resampling of a constant image is that constant, so the
    // post-resize channel means are resampler-independent. Pin it in
    // CI with exact (not approximate) equality over the committed
    // fixture payloads — if a JDK update ever changed the bilinear
    // kernel in a way that broke constancy (it cannot, but loudly
    // beats silently), this fails before the driver's oracle does.
    val got = graft.queries.GroupH.queries("h2_media_resize")(spark, "")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val want = spark.read.parquet(Media.resizeExpectedPath)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet)
    for ((name, w) <- want)
      assert(got(name) == w, s"fixture $name: got ${got(name)}, want $w")
  }

  test("frameSample emits every Nth frame with non-empty bytes") {
    val frames = Media.frameSample(media.filter($"meta.kind" === "video"), everyN = 2)
    assert(frames.filter($"frame_no" % 2 =!= 0).count() == 0)
    assert(frames.filter(length($"frame_bytes") === 0).count() == 0)
    // A doc with n_frames in 1..8 sampled every 2 yields ceil(n/2) frames.
    val perDoc = frames.groupBy("id").count()
    val expect = media.filter($"meta.kind" === "video")
      .select($"id", ceil($"meta.n_frames" / 2.0).cast("long").as("want"))
    assert(perDoc.join(expect, "id").filter($"count" =!= $"want").count() == 0)
  }

  test("MediaEmbedder seam: batch shape honored, nulls never reach the embedder") {
    // A fifth of the rows lose their payload; the recording embedder
    // must see only non-null payloads, in ≤ batchSize batches that
    // cover them exactly once, and the null rows must come back with
    // null features in their original places.
    val withNulls = media.withColumn("media",
      when($"id" % 5 === 0, lit(null).cast(BinaryType)).otherwise($"media"))
    RecordingEmbedder.batches.clear()
    val out = Media.decodeFeatures(withNulls, dim = 3, batchSize = 5,
        embedder = RecordingEmbedder)
      .select($"id", $"features").as[(Long, Option[Seq[Float]])]
      .collect().toMap
    assert(out.keySet == media.select($"id").as[Long].collect().toSet)
    out.foreach { case (id, f) =>
      if (id % 5 == 0) assert(f.isEmpty, s"null payload $id must yield null")
      else assert(f.exists(_.length == 3), s"row $id lost its features")
    }
    val sizes = scala.jdk.CollectionConverters
      .IteratorHasAsScala(RecordingEmbedder.batches.iterator()).asScala
      .map(_.intValue).toList
    assert(sizes.sum == out.count { case (id, _) => id % 5 != 0 },
      "embedder must see every non-null payload exactly once")
    assert(sizes.forall(s => s >= 1 && s <= 5), s"batch sizes out of contract: $sizes")
  }

  test("MediaEmbedder seam: wrong-arity and wrong-dim embedders fail loudly") {
    val wrongArity = new Media.MediaEmbedder {
      def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
        payloads.drop(1).map(_ => Array.fill(dim)(0f))
    }
    intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(media, dim = 2, batchSize = 8,
        embedder = wrongArity).count()
    }
    // A model that ignores the requested dimension (512-d ONNX net
    // plugged in while the pipeline asks for 8) must fail at the
    // seam, not hand mis-shaped arrays to fixed-dim consumers.
    val wrongDim = new Media.MediaEmbedder {
      def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
        payloads.map(_ => Array.fill(dim + 3)(0f))
    }
    intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(media, dim = 2, batchSize = 8,
        embedder = wrongDim).count()
    }
  }

  test("LinearEmbedder: a real committed model artifact round-trips through decodeFeatures") {
    // The model is a real weight FILE (tools/gen_linear_embedder.py),
    // loaded lazily per executor from a path-only serialized handle,
    // and its embeddings are compared against the generator's
    // INDEPENDENT float64-loop computation of every media fixture —
    // so the full production path (artifact on disk → transient
    // handle → batched embedBatch → fixed-dim verification) runs for
    // real, not through the stub. Tolerance 1e-6 relative: both sides
    // accumulate in float64 in the same order and cast once to
    // float32, but the generator is a different implementation.
    val fixtures = ss.read.parquet(Media.fixturesPathChecked)
    val out = Media.decodeFeatures(fixtures, dim = 8, batchSize = 3,
        embedder = new Media.LinearEmbedder(Media.linearModelPath))
      .select("name", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val want = ss.read.parquet(
        new java.io.File(Media.linearModelPath).getParent + "/linear_expected.parquet")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out.keySet == want.keySet && out.size == 8)
    for ((name, w) <- want; (g, e) <- out(name).zip(w))
      assert(math.abs(g - e) <= 1e-6 * math.max(1.0f, math.abs(e)),
        s"$name drifted: got $g want $e")
    // A dim the artifact does not produce must fail loudly (the
    // model-ignores-dim contract), not reshape.
    val err = intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(fixtures, dim = 4,
        embedder = new Media.LinearEmbedder(Media.linearModelPath))
        .write.format("noop").mode("overwrite").save()
    }
    assert(err.getMessage != null)
  }

  test("h1 fixtures decode bit-for-bit to the committed independent expected features") {
    // The committed fixtures + expected parquets are the h1 machine
    // oracle (tools/gen_media_fixtures.py); pin the same equality in
    // CI so a codec or fixture regression fails before the driver's
    // gate ever sees it. EXACT compare, no tolerance: the generator
    // replicates the engine's float32 arithmetic.
    val got = graft.queries.GroupH.queries("h1_media_decode")(ss, "")
      .orderBy("name")
      .select("name", "kind", "img_width", "img_height",
        "mean_r", "mean_g", "mean_b",
        "sample_rate", "n_channels", "n_samples", "rms")
      .collect().map(_.toSeq)
    val want = ss.read.parquet(Media.expectedPath)
      .orderBy("name")
      .select("name", "kind", "img_width", "img_height",
        "mean_r", "mean_g", "mean_b",
        "sample_rate", "n_channels", "n_samples", "rms")
      .collect().map(_.toSeq)
    assert(got.length == 8)
    assert(got.toSeq == want.toSeq)
    // The corrupt payload must be present and all-null — the
    // "unparseable yields nulls, never a dead task" contract proven
    // through the same gate.
    val corrupt = got.find(_.head == "corrupt_bytes").get
    assert(corrupt.drop(2).forall(_ == null))
  }
}

/** Top-level object so Spark's closure serializer ships a module
  * reference and readResolve hands every task the same singleton —
  * the recorded batches are then visible to the driver in local mode. */
object RecordingEmbedder extends graft.multimodal.Media.MediaEmbedder {
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] = {
    batches.add(payloads.length)
    payloads.map(p => Array.fill(dim)(p.length.toFloat))
  }
}
