package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Fused sessionize + small-gap interpolation at the PACKET level (before
  * the per-channel explode): one range partition pass computes, per
  * partition, (first/last row, local break count); the driver resolves
  * boundary breaks and segment-id offsets; a second pass assigns segment
  * ids AND synthesizes interpolated packets inline, interpolating the
  * whole channel array per missing timestamp.
  *
  * Compared to the long-layout route (explode → window per channel →
  * union) this removes the widest shuffle of the extract pipeline: gap
  * logic runs on n_packets rows instead of n_packets × n_channels, and
  * the explode happens exactly once on the final stream.
  *
  * Both passes run on Catalyst InternalRows end to end
  * (`Bridge.toInternalRdd` → `UnsafeRowWriter` → `internalCreateDataFrame`):
  * the previous external-Row formulation boxed every channel sample twice
  * (Row.getSeq[Short] per packet in, CatalystTypeConverters per row out),
  * which dominated extract_channels' wall time — the decode kernel itself
  * runs at memcpy-ish speed.
  */
object PacketGapFill {

  /** @param df (ts: Long, values: array<short>) — packet stream. Pass
    *           `dedupTieBreak` (e.g. file_rank, pos) to ALSO apply U2
    *           dedup-keep-first inside the same pass: equal timestamps
    *           always land in one range partition, so the dedup is
    *           purely partition-local — fusing it here removes a whole
    *           hash shuffle of the packet payloads from the extract
    *           pipeline (the widest data in flight).
    * @return (ts, values, segment_id, interpolated) */
  def fillAndSegment(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int = 0,
      dedupTieBreak: Seq[String] = Nil
  ): DataFrame = run(df, maxGapSize, numPartitions, dedupTieBreak, exploded = false)

  /** [[fillAndSegment]] with the per-channel explode FUSED into the same
    * pass: emits `(segment_id, ts, interpolated, channel, value)` rows
    * (five fixed-width fields, no per-packet array column, no Generate
    * operator) straight from the gap-fill iterator — the layout
    * extract_channels wants. */
  def fillAndSegmentExploded(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int = 0,
      dedupTieBreak: Seq[String] = Nil
  ): DataFrame = run(df, maxGapSize, numPartitions, dedupTieBreak, exploded = true)

  private def run(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int,
      dedupTieBreak: Seq[String],
      exploded: Boolean
  ): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    require(
      df.columns.contains("ts") && df.columns.contains("values"),
      "need ts and values columns"
    )
    // epoch break at diff >= maxGap+2; fill when 1 < diff <= maxGap+1
    val breakAt = maxGapSize + 2

    // sort by (ts, tieBreak...) so the FIRST row of each duplicate run is
    // the keeper (deterministic keep-first, matching Dedup.keepFirst)
    val sorted = df
      .select((Seq(col("ts"), col("values")) ++ dedupTieBreak.map(col)): _*)
      .repartitionByRange(n, col("ts"))
      .sortWithinPartitions((Seq(col("ts")) ++ dedupTieBreak.map(col)): _*)
    val dedup = dedupTieBreak.nonEmpty
    // persist the copied UnsafeRow RDD, not the DataFrame: it is both the
    // correctness anchor fixing the sampled range partitioning across the
    // two passes (see Sessionize) and much cheaper than the relation
    // cache, which would encode every packet into columnar batches only
    // to decode them back per pass
    val internal = Bridge
      .toInternalRdd(sorted)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val stats = internal
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val firstTs = first.getLong(0)
          val firstVals = first.getArray(1).toShortArray()
          var prev = firstTs
          var last = firstTs
          var breaks = 0L
          it.foreach { r =>
            val ts = r.getLong(0)
            if (!(dedup && ts == prev)) {
              if (ts - prev >= breakAt) breaks += 1
              prev = ts; last = ts
            }
          }
          Iterator.single((pid, firstTs, firstVals, last, breaks))
        }
      }
      .collect()
      .sortBy(_._1)

    // driver: segment-id offsets + the boundary rows needed for cross-
    // partition gap interpolation
    val offsets = new Array[Long](n)
    val nextFirst = new Array[(Long, Array[Short])](n) // next non-empty partition's first row
    var acc = 0L
    var prevLast = Long.MinValue
    val byPid = stats.map(s => s._1 -> s).toMap
    (0 until n).foreach { pid =>
      byPid.get(pid) match {
        case Some((_, firstTs, _, lastTs, breaks)) =>
          val bb = prevLast != Long.MinValue && firstTs - prevLast >= breakAt
          offsets(pid) = acc + (if (bb) 1L else 0L)
          acc = offsets(pid) + breaks
          prevLast = lastTs
        case None =>
          offsets(pid) = acc
      }
    }
    var carry: (Long, Array[Short]) = null
    (n - 1) to 0 by -1 foreach { pid =>
      nextFirst(pid) = carry
      byPid.get(pid).foreach(s => carry = (s._2, s._3))
    }
    val bc = spark.sparkContext.broadcast((offsets, nextFirst, breakAt, maxGapSize))

    val outSchema =
      if (exploded)
        StructType(Seq(
          StructField("segment_id", LongType, nullable = false),
          StructField("ts", LongType, nullable = false),
          StructField("interpolated", IntegerType, nullable = false),
          StructField("channel", IntegerType, nullable = false),
          StructField("value", ShortType, nullable = false)
        ))
      else
        StructType(Seq(
          StructField("ts", LongType, nullable = false),
          StructField("values", ArrayType(ShortType, containsNull = false), nullable = false),
          StructField("segment_id", LongType, nullable = false),
          StructField("interpolated", IntegerType, nullable = false)
        ))

    val outRdd = internal.mapPartitionsWithIndex { (pid, it0) =>
      import org.apache.spark.sql.catalyst.expressions.codegen.{UnsafeArrayWriter, UnsafeRowWriter}
      val (offs, nxtF, brk, maxGap) = bc.value
      val dedupB = dedup
      val buf = it0.map(r => (r.getLong(0), r.getArray(1).toShortArray())).buffered
      var seg = offs(pid)
      var prevTs = Long.MinValue

      def interpPackets(
          t0: Long, v0: Array[Short], t1: Long, v1: Array[Short], segId: Long
      ): Iterator[(Long, Array[Short], Long, Int)] = {
        val d = t1 - t0
        if (d <= 1 || d > maxGap + 1) Iterator.empty
        else {
          // channel-count homogeneity is enforced at the scan
          // (RecScan.read), but a direct caller could mix sources
          require(
            v0.length == v1.length,
            s"packet channel counts differ across a gap: ${v0.length} vs ${v1.length}"
          )
          (t0 + 1 until t1).iterator.map { t =>
            val vals = new Array[Short](v0.length)
            var c = 0
            while (c < v0.length) {
              // numpy interp1d + astype(int16): double math, truncate to 0
              vals(c) = (v0(c) + (t - t0).toDouble * (v1(c) - v0(c)) / d.toDouble).toShort
              c += 1
            }
            (t, vals, segId, 1)
          }
        }
      }

      // logical packet stream incl. synthesized gap packets
      val packets = new Iterator[(Long, Array[Short], Long, Int)] {
        private var pending: Iterator[(Long, Array[Short], Long, Int)] = Iterator.empty
        override def hasNext: Boolean = pending.hasNext || buf.hasNext
        override def next(): (Long, Array[Short], Long, Int) = {
          if (pending.hasNext) return pending.next()
          val (ts, vals) = buf.next()
          if (prevTs != Long.MinValue && ts - prevTs >= brk) seg += 1
          prevTs = ts
          // fused U2: drop the rest of a duplicate-ts run (sorted by
          // tie-break, so this row is the deterministic keeper)
          if (dedupB) {
            while (buf.hasNext && buf.head._1 == ts) buf.next()
          }
          // queue interpolations toward the next row (or boundary row)
          val nxt: Option[(Long, Array[Short])] =
            if (buf.hasNext) Some(buf.head) else Option(nxtF(pid))
          nxt match {
            case Some((nt, nv)) if nt - ts > 1 && nt - ts <= maxGap + 1 =>
              pending = interpPackets(ts, vals, nt, nv, seg)
            case _ =>
          }
          (ts, vals, seg, 0)
        }
      }

      // the emitted UnsafeRow is REUSED across iterations: the plan-side
      // consumer (RDDScanExec) re-projects every ExistingRDD row into its
      // own buffer anyway, so a per-row copy here would only double the
      // allocation rate of the widest stream in the pipeline
      if (exploded) {
        val writer = new UnsafeRowWriter(5)
        packets.flatMap { case (ts, vals, segId, interp) =>
          (0 until vals.length).iterator.map { c =>
            writer.reset()
            writer.write(0, segId)
            writer.write(1, ts)
            writer.write(2, interp)
            writer.write(3, c)
            writer.write(4, vals(c))
            writer.getRow: InternalRow
          }
        }
      } else {
        val writer = new UnsafeRowWriter(4)
        val arrWriter = new UnsafeArrayWriter(writer, 2)
        packets.map { case (ts, vals, segId, interp) =>
          writer.reset()
          writer.write(0, ts)
          writer.write(2, segId)
          writer.write(3, interp)
          val cursorBefore = writer.cursor()
          arrWriter.initialize(vals.length)
          var i = 0
          while (i < vals.length) { arrWriter.write(i, vals(i)); i += 1 }
          writer.setOffsetAndSizeFromPreviousCursor(1, cursorBefore)
          writer.getRow: InternalRow
        }
      }
    }
    Bridge.internalCreateDataFrame(spark, outRdd, outSchema)
  }
}
