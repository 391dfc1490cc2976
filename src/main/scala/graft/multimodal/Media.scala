package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  * Image decode is REAL where the JVM has codecs built in
  * ([[decodeImageStats]], via `javax.imageio`: PNG/JPEG/BMP/GIF); the
  * feature-embedding step is STUBBED — no model runtime in this
  * container — with a deterministic fake extractor; everything around
  * it (schema, batch shape, partitioning, frame slicing) is the real
  * Spark-side plumbing a production decoder would plug into.
  *
  * Scale posture: `decodeFeatures` is the only non-declarative step
  * (per-partition iterator, no shuffle, batch-at-a-time so a vectorized
  * decoder amortizes model/codec setup); `frameSample` stays fully
  * declarative (binary `substring` + `explode`), so Catalyst can prune
  * and push around it.
  */
object Media {

  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Deterministic synthetic media rows derived from `documents` —
    * text bytes stand in for encoded image/video payloads so the
    * pipeline is testable without real codecs. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        when(col("doc_id") % 3 === 0, lit("video"))
          .when(col("doc_id") % 3 === 1, lit("image"))
          .otherwise(lit("audio")).as("kind"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        (col("doc_id") % 8 + 1).cast("int").as("n_frames")).as("meta"))

  /** The pluggable embedding seam: a production model (ONNX via its
    * Java API, a JNI-wrapped encoder, an HTTP sidecar) implements
    * this ONE method and drops into [[decodeFeatures]] without
    * touching any pipeline code. Contract: called once per
    * partition-local batch with ONLY non-null payloads (null media
    * propagates to null features in the plumbing, an embedder never
    * sees it — MediaSpec pins both); must return exactly one `dim`-
    * float vector per payload, in order; must be Serializable (the
    * instance ships to executors inside the task closure, so model
    * handles should be lazy/transient and materialize per-executor)
    * and thread-safe across concurrent partitions. */
  trait MediaEmbedder extends Serializable {
    def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]]
  }

  /** ==== STUB ==== The default [[MediaEmbedder]]: a deterministic
    * hash-based fake — no model runtime in this container — keeping
    * the contract (`dim` floats in [0, 1) per payload) testable. */
  object StubEmbedder extends MediaEmbedder {
    def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
      payloads.map { payload =>
        val base = scala.util.hashing.MurmurHash3.bytesHash(payload, 42)
        Array.tabulate(dim) { i =>
          val h = scala.util.hashing.MurmurHash3.orderedHash(Seq(base, i))
          (h & 0x7fffffff).toFloat / Int.MaxValue
        }
      }
  }

  /** A REAL (tiny) model-artifact embedder — retires the stub's "no
    * model runtime" caveat with the exact deployment mechanics a
    * production encoder needs, at committed-fixture scale: the model
    * is a WEIGHT FILE on disk (magic `GFTW` | int32 LE in_dim=256 |
    * int32 LE out_dim | out×in float32 LE row-major — written by
    * tools/gen_linear_embedder.py, which also computes every media
    * fixture's expected embedding INDEPENDENTLY, the a23/h1 oracle
    * pattern), loaded LAZILY PER EXECUTOR through a @transient lazy
    * handle (the instance serializes as just the path — the scaladoc
    * contract above, now exercised for real), and applied as a
    * linear encoder over a byte-histogram feature map: feat[i] =
    * count(byte==i)/len, out[j] = Σ_i feat[i]·W[j][i] accumulated in
    * double in ascending i (bit-identical to the generator's float64
    * loop) and cast to float. An ONNX/JNI runtime was considered and
    * declined: no runtime jar ships in this environment and the
    * dependency set is frozen — the seam a real runtime would plug
    * into is exactly this class with `embedBatch` swapped, and every
    * OTHER production concern (artifact distribution, lazy handles,
    * batching, dim verification, null routing) is real here. */
  final class LinearEmbedder(modelPath: String) extends MediaEmbedder {
    @transient private lazy val model: (Int, Int, Array[Float]) = {
      val p = java.nio.file.Paths.get(modelPath)
      // The artifact also ships inside the jar (src/main/resources),
      // so a session launched away from the checkout root still loads
      // it from the classpath; a missing artifact fails LOUDLY at
      // load, naming the knob, never NoSuchFileException mid-task.
      val bytes =
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.readAllBytes(p)
        else {
          val res = Option(getClass
            .getResourceAsStream("/graft/" + p.getFileName.toString))
          require(res.isDefined,
            s"model weight file not found at $modelPath nor on the " +
              s"classpath at /graft/${p.getFileName} — set " +
              "GRAFT_LINEAR_MODEL_PATH or launch from the checkout root")
          try res.get.readAllBytes() finally res.get.close()
        }
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4); bb.get(magic)
      require(new String(magic, "US-ASCII") == "GFTW",
        s"$modelPath is not a GFTW weight file")
      val inDim = bb.getInt; val outDim = bb.getInt
      // The byte-histogram feature map is structurally 256 bins; a
      // file with another in_dim must be refused HERE with a named
      // error, not surface as an AIOOBE inside executor tasks.
      require(inDim == 256,
        s"$modelPath declares in_dim=$inDim; the byte-histogram " +
          "encoder requires 256")
      require(outDim > 0 && bb.remaining == inDim * outDim * 4,
        s"$modelPath has ${bb.remaining} weight bytes for " +
          s"declared ${inDim}x$outDim — truncated or mismatched dims")
      val w = new Array[Float](inDim * outDim)
      var i = 0
      while (i < w.length) { w(i) = bb.getFloat; i += 1 }
      (inDim, outDim, w)
    }
    def embedBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] = {
      val (inDim, outDim, w) = model
      // A model cannot invent dimensions: a caller asking for a dim
      // this artifact does not produce must fail loudly here (the
      // decodeFeatures contract), never reshape silently.
      require(dim == outDim,
        s"model $modelPath produces $outDim-float embeddings; " +
          s"requested dim = $dim")
      payloads.map { payload =>
        val hist = new Array[Long](inDim)
        var i = 0
        while (i < payload.length) { hist(payload(i) & 0xff) += 1; i += 1 }
        val n = payload.length.toDouble
        Array.tabulate(outDim) { j =>
          var acc = 0.0
          var k = 0
          while (k < inDim) {
            if (hist(k) != 0) acc += (hist(k) / n) * w(j * inDim + k)
            k += 1
          }
          acc.toFloat
        }
      }
    }
  }

  /** The committed weight artifact for [[LinearEmbedder]] (the
    * fixturesPath resolution pattern). */
  lazy val linearModelPath: String =
    sys.env.getOrElse("GRAFT_LINEAR_MODEL_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/linear_embedder.bin")
        .toAbsolutePath.toString)

  /** Feature extraction over the binary column: partition-local,
    * batch-at-a-time (`batchSize` rows per [[MediaEmbedder]] call —
    * the shape a vectorized/GPU decoder needs), appending `features
    * array<float>`. No shuffle: rows stay where the scan put them.
    * Rows with null media keep their place with null features. */
  def decodeFeatures(df: DataFrame, dim: Int = 8, batchSize: Int = 64,
                     embedder: MediaEmbedder = StubEmbedder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // One call per batch: a real decoder processes the whole
        // payload sequence in a single vectorized invocation.
        val payloads = batch.collect {
          case r if !r.isNullAt(mediaIdx) => r.getAs[Array[Byte]](mediaIdx)
        }
        val feats =
          if (payloads.isEmpty) Seq.empty
          else embedder.embedBatch(payloads, dim)
        require(feats.length == payloads.length,
          s"embedder returned ${feats.length} vectors for " +
            s"${payloads.length} payloads — the one-per-payload contract")
        require(feats.forall(_.length == dim),
          s"embedder returned a ${feats.map(_.length).find(_ != dim).get}-" +
            s"float vector where dim = $dim — a model ignoring the " +
            "requested dimension must fail here, not feed mis-shaped " +
            "arrays to fixed-dim consumers downstream")
        val it = feats.iterator
        batch.map { r =>
          Row.fromSeq(r.toSeq :+ (if (r.isNullAt(mediaIdx)) null else it.next()))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG,
    * JPEG, BMP, GIF — no external codec dependency, so unlike the
    * feature-model stub this path actually decodes): appends the
    * decoded `img_width`/`img_height` and per-channel mean intensity
    * `mean_rgb` in [0, 1]. Payloads ImageIO cannot parse (audio,
    * video, corrupt bytes) yield nulls — the caller filters or falls
    * back to [[decodeFeatures]].
    *
    * Same scale posture as decodeFeatures: partition-local map, no
    * shuffle; decoding reads the in-memory bytes directly (a
    * MemoryCacheImageInputStream — ImageIO's default wrapper would
    * spool every payload to a tmpdir file first). The per-pixel
    * getRGB walk is the simple correct form; a throughput-critical
    * decoder would read the raster buffer directly (and that swap
    * stays inside this one function).
    */
  def decodeImageStats(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType),
      StructField("mean_rgb", ArrayType(FloatType, containsNull = false))))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        // MemoryCacheImageInputStream: ImageIO's default stream wrapper
        // spools every payload to a tmpdir file before decoding (one
        // disk write + create/delete per row); the bytes are already
        // in memory. NonFatal, not just IOException: JDK decoders
        // throw CMMException / ArrayIndexOutOfBounds / IllegalArgument
        // on corrupt-but-recognized payloads, and the contract is
        // "unparseable yields nulls", never a dead task.
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(
              new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toFloat * h * 255
          Row.fromSeq(r.toSeq ++
            Seq(w, h, Array(sr / n, sg / n, sb / n)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize via JDK-only AWT (decode → Graphics2D bilinear
    * scale → PNG re-encode): replaces the `media` payload with the
    * resized PNG and appends the original dimensions — the
    * fixed-input-size normalization step a vision training pipeline
    * runs before feature extraction. Unparseable payloads keep their
    * row with a NULL `media` and null dims (the "unparseable yields
    * nulls, never a dead task" contract shared by every decoder
    * here). Same scale posture as [[decodeImageStats]]: a
    * partition-local map over in-memory bytes, zero shuffle, no
    * tmpdir spooling; `mapPartitions` is justified because codecs are
    * not SQL-expressible.
    */
  def resizeImages(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1,
      s"width/height must be >= 1, got $width/$height")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("orig_width", IntegerType),
      StructField("orig_height", IntegerType)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(
              new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          Row.fromSeq(r.toSeq.updated(mediaIdx, null) ++ Seq(null, null))
        else {
          val out = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          Row.fromSeq(r.toSeq.updated(mediaIdx, buf.toByteArray) ++
            Seq(img.getWidth, img.getHeight))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU — no external codec dependency): appends the
    * container metadata `sample_rate`/`n_channels`/`n_samples` and,
    * for 16-bit signed PCM payloads, the normalized RMS amplitude in
    * [0, 1] (`rms`) — the loudness feature an audio curation pipeline
    * filters on (silence/clipping cuts). Unparseable payloads yield
    * all-null columns; parseable-but-non-PCM16 payloads keep their
    * metadata with a null `rms`. Same scale posture as the image
    * path: partition-local map, zero shuffle, bytes decoded straight
    * from memory.
    */
  def decodeAudioStats(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", FloatType),
      StructField("n_channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("rms", FloatType)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        var extra: Seq[Any] = Seq(null, null, null, null)
        if (bytes != null) {
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              // NOT_SPECIFIED (-1) containers (e.g. AU with the
              // unknown-size header field) still decode fine — the RMS
              // walk reads the stream, never the declared length, so
              // only n_samples goes null for them.
              val nFrames = ais.getFrameLength
              val pcm16 =
                fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  fmt.getSampleSizeInBits == 16
              val rms: Any = if (!pcm16) null else {
                // Accumulate in fixed-size read chunks: readAllBytes()
                // would buffer the WHOLE decoded PCM stream on top of
                // the binary payload — O(clip length) extra heap per
                // row. A sample can straddle a chunk boundary, so the
                // first byte of a split sample carries over.
                val big = fmt.isBigEndian
                val chunk = new Array[Byte](8192)
                var sum = 0.0; var n = 0
                var b0 = 0; var haveB0 = false
                var read = ais.read(chunk)
                while (read > 0) {
                  var i = 0
                  while (i < read) {
                    val b = chunk(i) & 0xff
                    if (!haveB0) { b0 = b; haveB0 = true }
                    else {
                      val v = if (big) (b0 << 8) | b else (b << 8) | b0
                      val s = v.toShort.toDouble / 32768.0
                      sum += s * s; n += 1; haveB0 = false
                    }
                    i += 1
                  }
                  read = ais.read(chunk)
                }
                if (n == 0) null else math.sqrt(sum / n).toFloat
              }
              extra = Seq(fmt.getSampleRate, fmt.getChannels.toInt,
                if (nFrames >= 0) nFrames else null, rms)
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  /** Committed media fixtures (name, kind, media BINARY — real PNG and
    * WAV payloads plus one corrupt one) and the expected features an
    * INDEPENDENT implementation computed for them
    * (tools/gen_media_fixtures.py: pure-Python struct+zlib PNG and
    * stdlib-wave WAV encoders, features replicated with numpy float32
    * — the a23 expected-vectors pattern). h1's Spark side decodes the
    * fixtures with [[decodeImageStats]]/[[decodeAudioStats]]; the
    * DuckDB oracle reads the expected parquet — so the hash gate
    * proves the REAL codecs, not a stub, reproduce independently
    * computed values. Plain filesystem paths (DuckDB reads outside
    * the JVM), resolved from the checkout root; env overrides for
    * sessions launched elsewhere. No existence check here — the
    * oracle SQL interpolates [[expectedPath]] at registry
    * construction (the vectorsPath rule); the read side calls
    * [[fixturesPathChecked]]. */
  lazy val fixturesPath: String =
    sys.env.getOrElse("GRAFT_MEDIA_FIXTURES_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/media_fixtures.parquet")
        .toAbsolutePath.toString)
  lazy val expectedPath: String =
    sys.env.getOrElse("GRAFT_MEDIA_EXPECTED_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/media_expected.parquet")
        .toAbsolutePath.toString)

  /** The h2 resize fixtures + expected (same layout contract as
    * [[fixturesPath]]/[[expectedPath]]; written by the same
    * tools/gen_media_fixtures.py run). The fixtures are SOLID-COLOR
    * images on purpose: any convex resampling of a constant image is
    * that constant, so the expected post-resize means are
    * resampler-independent and the gate proves the decode → resize →
    * re-encode → re-decode round trip without pinning AWT's
    * interpolation kernel (which no independent implementation could
    * replicate bit-for-bit — MediaSpec pins the invariant itself). */
  lazy val resizeFixturesPath: String =
    sys.env.getOrElse("GRAFT_RESIZE_FIXTURES_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/resize_fixtures.parquet")
        .toAbsolutePath.toString)
  lazy val resizeExpectedPath: String =
    sys.env.getOrElse("GRAFT_RESIZE_EXPECTED_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/resize_expected.parquet")
        .toAbsolutePath.toString)

  /** The expected-embeddings parquet for the h4 oracle (written by
    * tools/gen_linear_embedder.py alongside [[linearModelPath]]'s
    * weight artifact — an independent pure-Python float64 loop over
    * the SAME media fixture payloads). */
  lazy val linearExpectedPath: String =
    sys.env.getOrElse("GRAFT_LINEAR_EXPECTED_PATH",
      java.nio.file.Paths.get(
        "src/main/resources/graft/linear_expected.parquet")
        .toAbsolutePath.toString)

  /** [[fixturesPath]] with a fail-fast existence check naming the
    * override knob (the vectorsPathChecked pattern). */
  def fixturesPathChecked: String = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(fixturesPath)),
      s"media fixtures parquet not found at $fixturesPath — launch from " +
        "the checkout root or set GRAFT_MEDIA_FIXTURES_PATH " +
        "(src/main/resources/graft/media_fixtures.parquet)")
    fixturesPath
  }

  /** [[expectedPath]] for the h1 oracle interpolation: when the file
    * is missing, WARN loudly naming the knob but still return the
    * path — building the oracle map must never throw, because the
    * map is constructed as a whole and one missing media fixture
    * would take every unrelated query's oracle down with it (the
    * round-11 review's blast-radius point); the h1 row then fails
    * alone in DuckDB, now with the named-knob warning on record
    * instead of only the opaque read_parquet error. */
  def expectedPathChecked: String =
    warnIfMissing(expectedPath, "GRAFT_MEDIA_EXPECTED_PATH", "h1")

  /** [[resizeFixturesPath]] with the fail-fast read-side check. */
  def resizeFixturesPathChecked: String = {
    require(
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(resizeFixturesPath)),
      s"resize fixtures parquet not found at $resizeFixturesPath — launch " +
        "from the checkout root or set GRAFT_RESIZE_FIXTURES_PATH " +
        "(src/main/resources/graft/resize_fixtures.parquet)")
    resizeFixturesPath
  }

  /** [[resizeExpectedPath]] under the oracle-side WARN-don't-throw
    * contract (see [[expectedPathChecked]]). */
  def resizeExpectedPathChecked: String =
    warnIfMissing(resizeExpectedPath, "GRAFT_RESIZE_EXPECTED_PATH", "h2")

  /** [[linearExpectedPath]] under the same oracle-side contract. */
  def linearExpectedPathChecked: String =
    warnIfMissing(linearExpectedPath, "GRAFT_LINEAR_EXPECTED_PATH", "h4")

  private def warnIfMissing(path: String, knob: String,
                            query: String): String = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"expected-values parquet not found at $path — the $query oracle " +
          s"will fail in DuckDB; launch from the checkout root or set $knob")
    path
  }

  /** Declarative frame sampling for fixed-frame-size payloads: slice
    * the binary payload into `meta.n_frames` frames and keep every
    * `everyN`-th — binary `substring` + `explode`, no UDF, so the
    * sampling runs inside codegen and row counts stay plannable. */
  def frameSample(df: DataFrame, everyN: Int): DataFrame =
    df.withColumn("frame_size",
        greatest(floor(length(col("media")) / col("meta.n_frames")), lit(1)).cast("int"))
      .withColumn("frame_no",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))))
      .select(col("id"), col("frame_no"),
        col("media").substr(col("frame_no") * col("frame_size") + 1,
          col("frame_size")).as("frame_bytes"))
}
