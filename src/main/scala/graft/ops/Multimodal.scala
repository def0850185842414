package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) travel as opaque `binary` columns with typed
  * metadata; decode / feature-extract run as batched partition-level
  * kernels (the Scala analog of `mapInPandas`) so a real decoder drops in
  * without touching the plan.
  *
  * Image payloads decode through the REAL JDK codecs
  * (`javax.imageio` — PNG/BMP/GIF/JPEG) in [[decodeImage]] /
  * [[extractFeatures]] / [[resizeRgb]] / [[dhash]]; audio through the
  * JDK WAV reader in [[decodeWavPcm16]]. Only payloads NO JDK reader
  * recognizes (raw tensors, exotic containers) fall back to the
  * clearly-marked deterministic [[FakeDecoder]] stand-in, which keeps
  * the stage total while exercising the same Spark-side contract —
  * schema, batching, partitioning, kernel signature.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** STUB decoder — the fallback for payloads no JDK reader recognizes
    * (real images take [[decodeImage]] inside [[extractFeatures]]).
    * Deterministic: pretends the payload is a (w × h) raster derived
    * from the byte length and emits `dim` pooled features from the byte
    * stream. */
  object FakeDecoder {
    def decode(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
      val w = math.max(1, math.sqrt(payload.length.toDouble).toInt)
      val h = math.max(1, payload.length / math.max(1, w))
      val feats = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        feats(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (w, h, feats)
    }
  }

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * plumbing stand-in for reading real media bytes). */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", col(sourceCol).cast("binary"))

  /** Integer-exact pooled-luma features of a decoded raster: pixel
    * linear index p (row-major) lands in bucket p·dim/nPix (the
    * [[boxResizeRgb]] bucket scheme in 1-D), each feature is the
    * floor-mean BT.601 luma ([[grayOf]]) of its bucket — small exact
    * integers carried as Float, so a SQL oracle recomputes every value
    * bit for bit from fixture arithmetic. Buckets a tiny payload leaves
    * empty (nPix < dim) stay 0. */
  def pooledLumaFeatures(w: Int, h: Int, rgb: Array[Int], dim: Int): Array[Float] = {
    val n = w * h
    val sum = new Array[Long](dim)
    val cnt = new Array[Long](dim)
    var p = 0
    while (p < n) {
      val b = (p.toLong * dim / n).toInt
      sum(b) += grayOf(rgb(p))
      cnt(b) += 1
      p += 1
    }
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { if (cnt(i) > 0) out(i) = (sum(i) / cnt(i)).toFloat; i += 1 }
    out
  }

  /** Batched feature extraction over the binary column: one kernel call
    * per partition, vectorized over rows (the mapInPandas shape). Keeps
    * the key column + appends the feature struct fields.
    *
    * Payloads the JDK image readers recognize take the REAL path —
    * [[decodeImage]] → true (width, height) + integer-exact
    * [[pooledLumaFeatures]] (oracle-checked over real decoded pixels in
    * q_multimodal); anything else falls back to the deterministic
    * [[FakeDecoder]] stub so the stage stays total over mixed corpora. */
  def extractFeatures(df: DataFrame, keyCol: String, dim: Int = 8): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.unsafe.types.UTF8String
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val keyIdx = df.columns.indexOf(keyCol)
    val keyType = df.schema(keyIdx).dataType
    val outSchema = StructType(
      Seq(df.schema(keyIdx)) ++ featureSchema.fields
    )
    // Catalyst rows in and out (toInternalRdd/internalCreateDataFrame):
    // the kernel sees the raw payload bytes with no external-Row boxing —
    // the shape a real media decoder wants at 100 TB.
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val payload = r.getBinary(payloadIdx)
        val (w, h, feats) = decodeImage(payload) match {
          case Some((iw, ih, rgb)) => (iw, ih, pooledLumaFeatures(iw, ih, rgb, dim))
          case None                => FakeDecoder.decode(payload, dim)
        }
        md.reset()
        val md5hex = md.digest(payload).map("%02x".format(_)).mkString
        new GenericInternalRow(Array[Any](
          // copyValue: UnsafeRow iterators reuse the row slot; a string
          // key would otherwise be a view into overwritten bytes
          InternalRow.copyValue(r.get(keyIdx, keyType)),
          payload.length.toLong,
          UTF8String.fromString(md5hex),
          w,
          h,
          ArrayData.toArrayData(feats)
        )): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  // ---- real image codec (JDK javax.imageio — no external libraries) ----

  /** Decode an image payload with the JDK's built-in readers (PNG, BMP,
    * GIF, JPEG): returns (w, h, row-major packed 0xRRGGBB ints), or None
    * when the bytes are not a decodable image (no magic-byte match) —
    * the caller's cue to fall back to [[resizeStub]]. Both PNG and BMP
    * are lossless, so a decode of [[encodePng]]/`encodeBmp` output
    * round-trips pixels exactly. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB: per-pixel getRGB(x, y) re-enters the color
      // model per call; the bulk form converts a row at a time
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < argb.length) { argb(i) = argb(i) & 0xffffff; i += 1 }
      Some((w, h, argb))
    }
  }

  /** Exact integer box-filter resize on a packed-RGB raster: source
    * pixel (x, y) lands in bucket (x·outW / w, y·outH / h) (integer
    * division), each output pixel is the per-channel floor-mean of its
    * bucket. Requires w ≥ outW and h ≥ outH (downsample), which makes
    * every bucket non-empty. Integer-exact end to end, so an oracle can
    * reproduce it in SQL arithmetic. */
  def boxResizeRgb(w: Int, h: Int, rgb: Array[Int], outW: Int, outH: Int): Array[Int] = {
    require(w >= outW && h >= outH, s"box resize is downsample-only: ${w}x$h -> ${outW}x$outH")
    val sumR = new Array[Long](outW * outH)
    val sumG = new Array[Long](outW * outH)
    val sumB = new Array[Long](outW * outH)
    val cnt = new Array[Long](outW * outH)
    var y = 0
    while (y < h) {
      val oy = y * outH / h
      var x = 0
      while (x < w) {
        val o = oy * outW + (x * outW / w)
        val v = rgb(y * w + x)
        sumR(o) += (v >> 16) & 0xff
        sumG(o) += (v >> 8) & 0xff
        sumB(o) += v & 0xff
        cnt(o) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](outW * outH)
    var i = 0
    while (i < out.length) {
      out(i) = (((sumR(i) / cnt(i)).toInt) << 16) |
        (((sumG(i) / cnt(i)).toInt) << 8) |
        (sumB(i) / cnt(i)).toInt
      i += 1
    }
    out
  }

  /** Encode a packed-RGB raster (losslessly) with the JDK's PNG writer. */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] =
    encodeVia("png", w, h, rgb)

  /** Encode a packed-RGB raster (losslessly) with the JDK's BMP writer. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] =
    encodeVia("bmp", w, h, rgb)

  private def encodeVia(fmt: String, w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK $fmt writer")
    bos.toByteArray
  }

  /** Real decode → box-filter resize over the binary column, emitting
    * one row per OUTPUT PIXEL (`key, x, y, r, g, b`) — the
    * oracle-comparable form of the image path (a PNG re-encode is not
    * SQL-checkable; pixels are). Batched partition kernel, same shape as
    * [[extractFeatures]]. Payloads that are not decodable images are an
    * error here (use [[resize]] for the stub-fallback binary→binary
    * stage). */
  def resizeRgb(df: DataFrame, keyCol: String, outW: Int, outH: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val keyIdx = df.columns.indexOf(keyCol)
    val keyType = df.schema(keyIdx).dataType
    val outSchema = StructType(Seq(
      df.schema(keyIdx),
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false),
      StructField("r", IntegerType, nullable = false),
      StructField("g", IntegerType, nullable = false),
      StructField("b", IntegerType, nullable = false)
    ))
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      it.flatMap { r =>
        val key = InternalRow.copyValue(r.get(keyIdx, keyType))
        val payload = r.getBinary(payloadIdx)
        val (w, h, rgb) = decodeImage(payload).getOrElse(
          throw new IllegalArgumentException("resizeRgb: payload is not a decodable image"))
        val out = boxResizeRgb(w, h, rgb, outW, outH)
        (0 until outH).iterator.flatMap { y =>
          (0 until outW).iterator.map { x =>
            val v = out(y * outW + x)
            new GenericInternalRow(Array[Any](
              key, x, y, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff
            )): InternalRow
          }
        }
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  /** Deterministic image fixture, generated DISTRIBUTED: `n` images
    * whose pixel channels are pure arithmetic in (img_id, x, y) — so an
    * oracle can recompute the ground-truth pixels without any decoder —
    * encoded through the REAL JDK writers (PNG for even ids, BMP for
    * odd: both lossless). Dims vary per id to exercise ragged batches. */
  def imageFixture(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val rdd = Bridge.toInternalRdd(spark.range(n).toDF("img_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (16 + (id % 7).toInt, 12 + (id % 5).toInt)
        val rgb = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val pr = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val pg = ((id * 17 + x * 3 + y * 11) % 256).toInt
            val pb = ((id * 23 + x * 5 + y * 19) % 256).toInt
            rgb(y * w + x) = (pr << 16) | (pg << 8) | pb
            x += 1
          }
          y += 1
        }
        val bytes = if (id % 2 == 0) encodePng(w, h, rgb) else encodeBmp(w, h, rgb)
        new GenericInternalRow(Array[Any](id, bytes)): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(
      spark,
      rdd,
      StructType(Seq(
        StructField("img_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)
      ))
    )
  }

  /** STUB raster resize — the no-library fallback for payloads the JDK
    * readers cannot decode (raw tensors, exotic formats). Treats the
    * payload as a (w × h) row-major raster (FakeDecoder geometry) and
    * nearest-neighbor samples it to (outW × outH). The Spark-side
    * contract is the real one: binary in, binary out, batched per
    * partition, pure function of the payload. */
  def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val w = math.max(1, math.sqrt(payload.length.toDouble).toInt)
    val h = math.max(1, payload.length / w)
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = math.min(h - 1, y * h / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(w - 1, x * w / outW)
        val idx = sy * w + sx
        out(y * outW + x) = if (idx < payload.length) payload(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize stage over the binary column (batched kernel, same shape as
    * [[extractFeatures]]): appends `resized: binary`. Payloads the JDK
    * image readers recognize (PNG/BMP/GIF/JPEG) take the REAL path —
    * decode → [[boxResizeRgb]] → lossless PNG re-encode; anything else
    * (raw tensors, text stand-ins, exotic formats) falls back to the
    * deterministic [[resizeStub]], keeping the stage total. */
  def resize(df: DataFrame, outW: Int, outH: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val schema = df.schema
    val outSchema = StructType(
      schema.fields :+ StructField("resized", BinaryType, nullable = false)
    )
    val types = schema.fields.map(_.dataType)
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      it.map { r =>
        val vals = new Array[Any](types.length + 1)
        var i = 0
        while (i < types.length) { vals(i) = InternalRow.copyValue(r.get(i, types(i))); i += 1 }
        val payload = r.getBinary(payloadIdx)
        vals(types.length) = decodeImage(payload) match {
          case Some((w, h, rgb)) if w >= outW && h >= outH =>
            val out = boxResizeRgb(w, h, rgb, outW, outH)
            encodePng(outW, outH, out)
          case _ => resizeStub(payload, outW, outH)
        }
        new GenericInternalRow(vals): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  // ---- real audio codec (JDK javax.sound.sampled — no external libraries) ----

  /** Encode mono PCM16 samples as a RIFF/WAVE payload through the JDK's
    * own writer (`AudioSystem.write`). PCM is uncompressed, so a decode
    * of this output round-trips samples exactly. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat,
      16, 1, 2, sampleRate.toFloat, false) // 16-bit mono little-endian
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload with the JDK's built-in reader: returns
    * (sampleRate, mono PCM16 samples), or None when the bytes are not a
    * RIFF/WAVE stream — the caller's cue to fall back to a stub, the
    * same contract as [[decodeImage]]. Only the PCM16-mono profile this
    * pipeline writes is accepted; other profiles raise (a silent
    * re-quantization would corrupt features). */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    import javax.sound.sampled._
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: UnsupportedAudioFileException => return None }
    val fmt = ais.getFormat
    require(
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"decodeWavPcm16: unsupported profile $fmt")
    val bytes = ais.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
      i += 1
    }
    Some((fmt.getSampleRate.toInt, out))
  }

  /** Deterministic audio fixture, generated DISTRIBUTED: `n` clips whose
    * PCM16 samples are pure arithmetic in (aud_id, i) — so an oracle can
    * recompute the ground truth without any decoder — encoded through
    * the REAL JDK WAV writer. Lengths vary per id to exercise partial
    * trailing frames. */
  def audioFixture(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val rdd = Bridge.toInternalRdd(spark.range(n).toDF("aud_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val len = 400 + (id % 5).toInt * 160
        val samples = new Array[Short](len)
        var i = 0
        while (i < len) {
          samples(i) = (((id * 37 + i.toLong * 131) % 65536L) - 32768L).toShort
          i += 1
        }
        new GenericInternalRow(Array[Any](id, encodeWavPcm16(8000, samples))): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(
      spark,
      rdd,
      StructType(Seq(
        StructField("aud_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)
      ))
    )
  }

  /** Real WAV decode → fixed-size frame analysis over the binary column,
    * emitting one row per FRAME with integer-exact features — energy as
    * Σs² and zero crossings as #{i > 0 : (sᵢ < 0) ≠ (sᵢ₋₁ < 0)} within
    * the frame — so an oracle can recompute them in SQL arithmetic (an
    * RMS double would drag rounding semantics into the compare; Σs² is
    * the same information, exactly). Trailing partial frames are kept
    * with their true `n_samples`. Batched partition kernel, same shape
    * as [[resizeRgb]]. */
  def audioFrames(df: DataFrame, keyCol: String, frameSize: Int): DataFrame = {
    require(frameSize > 0)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val keyIdx = df.columns.indexOf(keyCol)
    val keyType = df.schema(keyIdx).dataType
    val outSchema = StructType(Seq(
      df.schema(keyIdx),
      StructField("frame", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("n_zero_cross", IntegerType, nullable = false)
    ))
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      it.flatMap { r =>
        val key = InternalRow.copyValue(r.get(keyIdx, keyType))
        val payload = r.getBinary(payloadIdx)
        val (_, samples) = decodeWavPcm16(payload).getOrElse(
          throw new IllegalArgumentException("audioFrames: payload is not a RIFF/WAVE stream"))
        val nFrames = (samples.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator.map { f =>
          val start = f * frameSize
          val end = math.min(start + frameSize, samples.length)
          var sumSq = 0L
          var zc = 0
          var i = start
          while (i < end) {
            val s = samples(i).toLong
            sumSq += s * s
            if (i > start && (samples(i) < 0) != (samples(i - 1) < 0)) zc += 1
            i += 1
          }
          new GenericInternalRow(Array[Any](key, f, end - start, sumSq, zc)): InternalRow
        }
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  /** Deterministic frame sampling for "video" payloads: split the byte
    * stream into `frameBytes` frames, keep every `stride`-th — pure
    * column ops, no kernel needed. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    df.withColumn("n_frames", (length(col("payload")) / frameBytes).cast("int"))
      // a payload with zero COMPLETE frames yields no rows (trailing
      // partial frames are dropped everywhere, including frame 0)
      .where(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn(
        "frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
      )
  }

  /** Energy-gated voice-activity segments over [[audioFrames]] — the
    * silence-trim / speech-extent step an audio-curation pipeline runs
    * before transcription or feature extraction. A frame is VOICED iff
    * its mean square power exceeds `thrMeanSq` — spelled as the integer
    * compare `sum_sq > thrMeanSq · n_samples` (exact on both engines,
    * partial tail frames normalized per sample); runs of consecutive
    * voiced frames collapse to (seg_id, start_frame, end_frame,
    * n_frames) via the gaps-and-islands recipe ([[graft.ts.Sessionize]]
    * shape, keyed per clip — windows partition on the clip key, whose
    * cardinality is the corpus, so no single-task window anywhere). */
  def vadSegments(
      df: DataFrame,
      keyCol: String,
      frameSize: Int,
      thrMeanSq: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val voiced = audioFrames(df, keyCol, frameSize)
      .where(col("sum_sq") > lit(thrMeanSq) * col("n_samples"))
    val isl = voiced.withColumn(
      "__isl",
      col("frame") - row_number().over(Window.partitionBy(keyCol).orderBy("frame")))
    isl
      .withColumn(
        "seg_id",
        (dense_rank().over(Window.partitionBy(keyCol).orderBy("__isl")) - 1).cast("int"))
      .groupBy(col(keyCol), col("seg_id"))
      .agg(
        min("frame").as("start_frame"),
        max("frame").as("end_frame"),
        count(lit(1)).cast("int").as("n_frames"))
  }

  /** Integer luma of a packed-RGB pixel: (299·r + 587·g + 114·b) / 1000
    * floor — the BT.601 weights in exact integer arithmetic, so a SQL
    * oracle reproduces every gray value bit for bit. */
  def grayOf(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000

  /** dHash (difference hash) of a decoded raster: gray → integer
    * box-filter resize to 9×8 (same bucket scheme as [[boxResizeRgb]],
    * floor-mean of the per-SOURCE-pixel luma) → 64 bits, bit (y·8 + x)
    * set iff gray[y][x+1] > gray[y][x]. The standard perceptual
    * near-dup signature for images (adjacent-gradient sign survives
    * re-encode/resize/small edits; Hamming distance ≈ visual change).
    * Integer-exact end to end. */
  def dhash64(w: Int, h: Int, rgb: Array[Int]): Long = {
    require(w >= 9 && h >= 8, s"dhash is downsample-only: ${w}x$h")
    val sum = new Array[Long](9 * 8)
    val cnt = new Array[Long](9 * 8)
    var y = 0
    while (y < h) {
      val oy = y * 8 / h
      var x = 0
      while (x < w) {
        val o = oy * 9 + (x * 9 / w)
        sum(o) += grayOf(rgb(y * w + x))
        cnt(o) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var oy = 0
    while (oy < 8) {
      var ox = 0
      while (ox < 8) {
        val l = sum(oy * 9 + ox) / cnt(oy * 9 + ox)
        val r = sum(oy * 9 + ox + 1) / cnt(oy * 9 + ox + 1)
        if (r > l) hash |= 1L << (oy * 8 + ox)
        ox += 1
      }
      oy += 1
    }
    hash
  }

  /** Per-image dHash over the binary payload column: REAL decode
    * (JDK readers) → [[dhash64]], emitted as two unsigned 32-bit
    * halves (`dhash_hi`, `dhash_lo`) so a SQL oracle can rebuild the
    * hash without signed-overflow gymnastics. Batched partition
    * kernel, stateless projection — zero shuffle at any scale. */
  def dhash(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val keyIdx = df.columns.indexOf(keyCol)
    val keyType = df.schema(keyIdx).dataType
    val outSchema = StructType(Seq(
      df.schema(keyIdx),
      StructField("dhash_hi", LongType, nullable = false),
      StructField("dhash_lo", LongType, nullable = false)
    ))
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      it.map { r =>
        val key = InternalRow.copyValue(r.get(keyIdx, keyType))
        val (w, h, rgb) = decodeImage(r.getBinary(payloadIdx)).getOrElse(
          throw new IllegalArgumentException("dhash: payload is not a decodable image"))
        val hash = dhash64(w, h, rgb)
        new GenericInternalRow(Array[Any](
          key, (hash >>> 32) & 0xffffffffL, hash & 0xffffffffL)): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  /** Fixed-point cosine table for [[phash64]]: round(cos(π(2i+1)u/64)
    * · 10⁶) for i ∈ [0, 32), u ∈ [0, 8) — integer by CONTRACT (a
    * fixed-point DCT, the hardware form), so the hash has no float
    * anywhere and a SQL oracle replays it exactly from the same
    * literals. */
  private[graft] val phashCosQ: Array[Long] = Array.tabulate(32 * 8) { i =>
    val x = i / 8
    val u = i % 8
    math.round(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 1000000.0)
  }

  /** pHash (DCT perceptual hash) of a decoded raster, fixed-point:
    * gray → nearest-sample resize to 32×32 (integer index map, works
    * for up- AND downsampling — the fixture images are smaller than
    * 32) → 8×8 low-frequency block of the fixed-point 2D DCT-II
    * (coefficients `Σ g·cq(x,u)·cq(y,v)` — exact longs, ≤ 2.7·10¹⁷)
    * → bit (v·8 + u) set iff the coefficient exceeds the MEAN of the
    * 64 excluding DC (the compare is the integer cross-multiply
    * `63·C > Σ_{≠DC} C` in BigInt — no division, no boundary).
    * Catches blur/re-encode/resize edits dHash's gradient signs miss. */
  def phash64(w: Int, h: Int, rgb: Array[Int]): Long = {
    require(w >= 1 && h >= 1, s"empty raster ${w}x$h")
    val g = new Array[Long](32 * 32)
    var oy = 0
    while (oy < 32) {
      val sy = oy * h / 32
      var ox = 0
      while (ox < 32) {
        g(oy * 32 + ox) = grayOf(rgb(sy * w + ox * w / 32)).toLong
        ox += 1
      }
      oy += 1
    }
    val coeffs = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val u = k % 8
      val v = k / 8
      var s = 0L
      var yy = 0
      while (yy < 32) {
        val cv = phashCosQ(yy * 8 + v)
        var xx = 0
        while (xx < 32) {
          s += g(yy * 32 + xx) * phashCosQ(xx * 8 + u) * cv
          xx += 1
        }
        yy += 1
      }
      coeffs(k) = s
      k += 1
    }
    // 63·C vs Σ(≠DC): magnitudes can pass 2^63 — BigInt, still exact
    val sumExcl = coeffs.iterator.map(BigInt(_)).sum - BigInt(coeffs(0))
    var hash = 0L
    k = 0
    while (k < 64) {
      if (BigInt(coeffs(k)) * 63 > sumExcl) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Per-image pHash over the binary payload column — the [[dhash]]
    * plumbing (real decode, batched partition kernel, zero shuffle)
    * with the fixed-point DCT hash, emitted as unsigned 32-bit
    * halves. */
  def phash(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadIdx = df.columns.indexOf("payload")
    require(payloadIdx >= 0, "call withPayload first")
    val keyIdx = df.columns.indexOf(keyCol)
    val keyType = df.schema(keyIdx).dataType
    val outSchema = StructType(Seq(
      df.schema(keyIdx),
      StructField("phash_hi", LongType, nullable = false),
      StructField("phash_lo", LongType, nullable = false)
    ))
    val rdd = Bridge.toInternalRdd(df).mapPartitions { it =>
      it.map { r =>
        val key = InternalRow.copyValue(r.get(keyIdx, keyType))
        val (w, h, rgb) = decodeImage(r.getBinary(payloadIdx)).getOrElse(
          throw new IllegalArgumentException("phash: payload is not a decodable image"))
        val hash = phash64(w, h, rgb)
        new GenericInternalRow(Array[Any](
          key, (hash >>> 32) & 0xffffffffL, hash & 0xffffffffL)): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, outSchema)
  }

  /** Near-duplicate image pairs over a [[dhash]] frame: the 64-bit hash
    * banded into four 16-bit keys (pigeonhole: Hamming ≤ 3 ⇒ at least
    * one band agrees), candidates from bucket membership (one
    * aggregate, no all-pairs), exact `bit_count` filter — the
    * [[DedupDocs.simhashNearDupPairs]] shape applied to the image
    * modality. */
  def dhashNearDupPairs(hashes: DataFrame, keyCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4-band pigeonhole guarantees recall only for Hamming <= 3, got $maxHamming")
    // bitwise reassembly — hi * 2^32 would signed-overflow under ANSI
    // when bit 63 is set; shiftleft|or is the wrap-free spelling
    val hash = shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo")).as("hash")
    val sig = hashes.select(col(keyCol).as("doc_id"), hash)
    val banded = sig.select(
      col("doc_id"),
      col("hash"),
      explode(array((0 until 4).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("hash"), 16 * b).bitwiseAND(65535L).as("band_key")
        )
      }: _*)).as("bk")
    )
    val buckets = banded
      .groupBy(col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("hash")))).as("docs"))
      .where(size(col("docs")) > 1)
    DedupDocs.explodePairs(buckets)
      .select(
        col("doc_a.doc_id").as("img_a"),
        col("doc_b.doc_id").as("img_b"),
        bit_count(col("doc_a.hash").bitwiseXOR(col("doc_b.hash"))).cast("long").as("hamming")
      )
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[imageFixture]] with PLANTED near-duplicates: ids 0..nBase-1 are
    * the base rasters (dims ≥ 9×8 for [[dhash64]]), ids
    * nBase..2·nBase-1 repeat base id−nBase with a single-pixel
    * perturbation (+1 mod 256 on the red channel at (0,0)) — a visual
    * near-dup whose dHash lands within a couple of bits of its base.
    * Same pure-arithmetic pixels, same lossless JDK encode round-trip. */
  def imageFixturePaired(spark: org.apache.spark.sql.SparkSession, nBase: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    val rdd = Bridge.toInternalRdd(spark.range(2L * nBase).toDF("img_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = id % nBase
        val pert = id >= nBase
        val (w, h) = (18 + (base % 5).toInt, 16 + (base % 3).toInt)
        val rgb = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var pr = ((base * 31 + x * 7 + y * 13) % 256).toInt
            if (pert && x == 0 && y == 0) pr = (pr + 1) % 256
            val pg = ((base * 17 + x * 3 + y * 11) % 256).toInt
            val pb = ((base * 23 + x * 5 + y * 19) % 256).toInt
            rgb(y * w + x) = (pr << 16) | (pg << 8) | pb
            x += 1
          }
          y += 1
        }
        val bytes = if (id % 2 == 0) encodePng(w, h, rgb) else encodeBmp(w, h, rgb)
        new GenericInternalRow(Array[Any](id, bytes)): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(
      spark,
      rdd,
      StructType(Seq(
        StructField("img_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)
      ))
    )
  }
}
