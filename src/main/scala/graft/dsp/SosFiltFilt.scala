package graft.dsp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import FilterDesign.{Biquad, Sos}

/** Zero-phase second-order-section filtering (G2,
  * jagular/filtering.py:114-194): forward-backward biquad cascade with
  * odd-extension padding and steady-state initial conditions — the
  * sequential numeric kernel the reference runs per epoch, here run as a
  * per-(channel, segment) `mapPartitions` kernel: segments are
  * independent, so the work is embarrassingly parallel across
  * channel×segment groups (the reference's own parallelism unit).
  */
object SosFiltFilt {

  /** Direct-form II transposed single-section filter with state. */
  private def sosfiltSection(s: Biquad, x: Array[Double], zi0: Double, zi1: Double): (Array[Double], Double, Double) = {
    val y = new Array[Double](x.length)
    var z0 = zi0; var z1 = zi1
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = s.b0 * xi + z0
      z0 = s.b1 * xi - s.a1 * yi + z1
      z1 = s.b2 * xi - s.a2 * yi
      y(i) = yi
      i += 1
    }
    (y, z0, z1)
  }

  /** Cascade filter with per-section initial conditions `zi` scaled by
    * the caller (shape: sections × 2). Returns filtered signal. */
  def sosfilt(sos: Sos, x: Array[Double], zi: Array[Array[Double]]): Array[Double] = {
    var cur = x
    var s = 0
    while (s < sos.length) {
      val (y, _, _) = sosfiltSection(sos(s), cur, zi(s)(0), zi(s)(1))
      cur = y
      s += 1
    }
    cur
  }

  /** Steady-state initial conditions per section (lfilter_zi per biquad,
    * with the cumulative DC-gain scaling across the cascade): for a
    * constant input of 1, the filter output is immediately at steady
    * state. Solves the 2×2 system (I − Aᵀ)zi = B per section. */
  def sosfiltZi(sos: Sos): Array[Array[Double]] = {
    var scale = 1.0
    sos.map { s =>
      // B = [b1 − a1·b0, b2 − a2·b0]; (I − Aᵀ) = [[1+a1, −1], [a2, 1]]
      val b0 = s.b1 - s.a1 * s.b0
      val b1 = s.b2 - s.a2 * s.b0
      val m00 = 1.0 + s.a1; val m01 = -1.0
      val m10 = s.a2; val m11 = 1.0
      val det = m00 * m11 - m01 * m10
      val zi0 = (b0 * m11 - b1 * m01) / det
      val zi1 = (m00 * b1 - m10 * b0) / det
      val out = Array(zi0 * scale, zi1 * scale)
      val dcGain = (s.b0 + s.b1 + s.b2) / (1.0 + s.a1 + s.a2)
      scale *= dcGain
      out
    }
  }

  /** Default pad length, matching the common convention
    * 3 × (2·n_sections + 1 − min(#{b2=0}, #{a2=0})). */
  def defaultPadLen(sos: Sos): Int = {
    val nb2 = sos.count(_.b2 == 0.0)
    val na2 = sos.count(_.a2 == 0.0)
    3 * (2 * sos.length + 1 - math.min(nb2, na2))
  }

  /** Odd extension: reflect about the end values. */
  private def oddExt(x: Array[Double], n: Int): Array[Double] = {
    require(x.length > n, s"padlen $n >= signal length ${x.length}")
    val out = new Array[Double](x.length + 2 * n)
    var i = 0
    while (i < n) {
      out(i) = 2.0 * x(0) - x(n - i)
      out(n + x.length + i) = 2.0 * x(x.length - 1) - x(x.length - 2 - i)
      i += 1
    }
    System.arraycopy(x, 0, out, n, x.length)
    out
  }

  /** Zero-phase forward-backward filter of one in-memory segment. */
  def filtfilt(sos: Sos, x: Array[Double], padLen: Int = -1): Array[Double] = {
    val n = if (padLen >= 0) padLen else defaultPadLen(sos)
    val pl = if (x.length <= n) x.length - 1 else n
    if (x.length <= 1) return x.clone()
    val ext = oddExt(x, pl)
    val zi = sosfiltZi(sos)
    def scaled(v: Double) = zi.map(z => Array(z(0) * v, z(1) * v))
    val fwd = sosfilt(sos, ext, scaled(ext(0)))
    val rev = fwd.reverse
    val bwd = sosfilt(sos, rev, scaled(rev(0)))
    val y = bwd.reverse
    y.slice(pl, pl + x.length)
  }

  /** Distributed per-segment zero-phase filtering. Each (keys) group is
    * buffered into PRIMITIVE arrays (ts: Long[], value: Double[], plus
    * any `carry` columns), filtered with the in-memory kernel, and
    * re-emitted — no per-row object retention, so a multi-million-sample
    * segment costs ~16 bytes/sample of task memory. Groups never
    * straddle partitions (repartition on keys + local sort).
    *
    * Output schema: keys ++ (tsCol, valueCol as double) ++ carry.
    *
    * For segments too large for one task, use [[filtfiltChunked]] — the
    * reference's own buffer/overlap scheme (filtering.py:150-192).
    */
  def filtfiltPerSegment(
      df: DataFrame,
      sos: Sos,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val projected = df.select((keys ++ Seq(tsCol, valueCol) ++ carry).map(col): _*)
    val nKeys = keys.length
    val tsPos = nKeys
    val vPos = nKeys + 1
    val carryPos = carry.indices.map(_ + nKeys + 2)

    val arranged = projected
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys :+ tsCol).map(col): _*)
    val schema = StructType(
      arranged.schema.fields.zipWithIndex.map { case (f, i) =>
        if (i == vPos) StructField(f.name, DoubleType, nullable = false) else f
      }
    )
    val sosB = sos // serialized into the closure (tiny)
    // InternalRow end to end (same as PacketGapFill): the external-Row
    // formulation converted 16 bytes of payload through boxed Rows twice
    // per sample. Keys/carry values are copied out of the reused
    // UnsafeRow; ts/value land in primitive builders.
    val inTypes = arranged.schema.fields.map(_.dataType)
    val rdd = org.apache.spark.sql.graftbridge.Bridge.toInternalRdd(arranged).mapPartitions { it =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      val buf = it.buffered
      new Iterator[InternalRow] {
        private var outKeys: Array[Any] = null
        private var outTs: Array[Long] = null
        private var outVal: Array[Double] = null
        private var outCarry: Array[Array[Any]] = null
        private var i = 0
        private var len = 0

        private def fillGroup(): Unit = {
          val first = buf.head
          val k = Array.tabulate[Any](nKeys)(j => InternalRow.copyValue(first.get(j, inTypes(j))))
          val ts = new scala.collection.mutable.ArrayBuilder.ofLong
          val vs = new scala.collection.mutable.ArrayBuilder.ofDouble
          val cs = Array.fill(carryPos.length)(Seq.newBuilder[Any])
          var done = false
          while (!done && buf.hasNext) {
            val r = buf.head
            var same = true
            var j = 0
            while (same && j < nKeys) { same = r.get(j, inTypes(j)) == k(j); j += 1 }
            if (!same) done = true
            else {
              buf.next()
              ts += r.getLong(tsPos)
              vs += toDouble(r.get(vPos, inTypes(vPos)))
              var c = 0
              while (c < carryPos.length) {
                cs(c) += InternalRow.copyValue(r.get(carryPos(c), inTypes(carryPos(c))))
                c += 1
              }
            }
          }
          outKeys = k
          outTs = ts.result()
          outVal = filtfilt(sosB, vs.result())
          outCarry = cs.map(_.result().toArray)
          i = 0
          len = outTs.length
        }

        override def hasNext: Boolean = i < len || buf.hasNext
        override def next(): InternalRow = {
          if (i >= len) fillGroup()
          val vals = new Array[Any](nKeys + 2 + carryPos.length)
          var j = 0
          while (j < nKeys) { vals(j) = outKeys(j); j += 1 }
          vals(tsPos) = outTs(i)
          vals(vPos) = outVal(i)
          var c = 0
          while (c < carryPos.length) { vals(nKeys + 2 + c) = outCarry(c)(i); c += 1 }
          i += 1
          new GenericInternalRow(vals)
        }
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(df.sparkSession, rdd, schema)
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case s: Short => s.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => throw new IllegalArgumentException(s"non-numeric value $other")
  }

  /** W5 chunked variant for very long segments (the reference's
    * buffer_len/overlap_len scheme, jagular/filtering.py:150-192): rows
    * are assigned to fixed-width chunks by ts, boundary rows are
    * DUPLICATED into the neighboring chunk (overlap extension), each
    * extended chunk is filtered independently, and only core rows are
    * kept. Exact in the interior; edge transients only at segment
    * boundaries, matching the reference's contract. Scales to segments of
    * any length: task memory is O(bufferLen + 2·overlapLen).
    */
  def filtfiltChunked(
      df: DataFrame,
      sos: Sos,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bufferLen: Long = 1L << 22,
      overlapLen: Long = 60000L,
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    // chunk index relative to segment start
    val withChunk = df
      .withColumn("__segstart", min(col(tsCol)).over(w))
      .withColumn("__rel", col(tsCol) - col("__segstart"))
      .withColumn("__chunk", (col("__rel") / bufferLen).cast("long"))
      .withColumn("__inchunk", col("__rel") % bufferLen)
    // duplicate into previous/next chunk when within overlap of an edge
    val assigned = withChunk
      .withColumn(
        "__tochunk",
        explode(
          concat(
            array(col("__chunk")),
            when(col("__inchunk") < overlapLen && col("__chunk") > 0, array(col("__chunk") - 1))
              .otherwise(array().cast("array<long>")),
            when(col("__inchunk") >= bufferLen - overlapLen, array(col("__chunk") + 1))
              .otherwise(array().cast("array<long>"))
          )
        )
      )
      .withColumn("__core", (col("__tochunk") === col("__chunk")).cast("int"))
    val filtered = filtfiltPerSegment(
      assigned,
      sos,
      keys :+ "__tochunk",
      tsCol,
      valueCol,
      carry = "__core" +: carry
    )
    filtered
      .where(col("__core") === 1)
      .drop("__tochunk", "__core")
  }
}
