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
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] is a clearly-marked deterministic stand-in
  * that exercises the real Spark-side contract — schema, batching,
  * partitioning, and kernel signature.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** STUB decoder — replace with a real image/audio decoder. Deterministic:
    * pretends the payload is a (w × h) raster derived from the byte length
    * and emits `dim` pooled features from the byte stream. */
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

  /** Batched feature extraction over the binary column: one kernel call
    * per partition, vectorized over rows (the mapInPandas shape). Keeps
    * the key column + appends the feature struct fields. */
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
        val (w, h, feats) = FakeDecoder.decode(payload, dim)
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

  /** STUB raster resize — replace with a real image library. Treats the
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
    * [[extractFeatures]]): appends `resized: binary` of outW×outH. */
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
        vals(types.length) = resizeStub(r.getBinary(payloadIdx), outW, outH)
        new GenericInternalRow(vals): InternalRow
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
}
