package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
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
      .persist(StorageLevel.MEMORY_AND_DISK) // correctness anchor (see Sessionize)
    val dedup = dedupTieBreak.nonEmpty

    final case class Stat(pid: Int, firstTs: Long, firstVals: Seq[Short], lastTs: Long, breaks: Long)
    val stats = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val firstTs = first.getLong(0)
          val firstVals = first.getSeq[Short](1)
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
          Iterator.single(Stat(pid, firstTs, firstVals, last, breaks))
        }
      }
      .collect()
      .sortBy(_.pid)

    // driver: segment-id offsets + the boundary rows needed for cross-
    // partition gap interpolation
    val offsets = new Array[Long](n)
    val nextFirst = new Array[(Long, Seq[Short])](n) // next non-empty partition's first row
    var acc = 0L
    var prevLast = Long.MinValue
    val byPid = stats.map(s => s.pid -> s).toMap
    (0 until n).foreach { pid =>
      byPid.get(pid) match {
        case Some(s) =>
          val bb = prevLast != Long.MinValue && s.firstTs - prevLast >= breakAt
          offsets(pid) = acc + (if (bb) 1L else 0L)
          acc = offsets(pid) + s.breaks
          prevLast = s.lastTs
        case None =>
          offsets(pid) = acc
      }
    }
    var carry: (Long, Seq[Short]) = null
    (n - 1) to 0 by -1 foreach { pid =>
      nextFirst(pid) = carry
      byPid.get(pid).foreach(s => carry = (s.firstTs, s.firstVals))
    }
    val bc = spark.sparkContext.broadcast((offsets, nextFirst, breakAt, maxGapSize))

    val outSchema = StructType(Seq(
      StructField("ts", LongType, nullable = false),
      StructField("values", ArrayType(ShortType, containsNull = false), nullable = false),
      StructField("segment_id", LongType, nullable = false),
      StructField("interpolated", IntegerType, nullable = false)
    ))

    val outRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val (offs, nxtF, brk, maxGap) = bc.value
      val dedupB = dedup
      val buf = it.buffered
      var seg = offs(pid)
      var prevTs = Long.MinValue

      def interpRows(t0: Long, v0: Seq[Short], t1: Long, v1: Seq[Short], segId: Long): Iterator[Row] = {
        val d = t1 - t0
        if (d <= 1 || d > maxGap + 1) Iterator.empty
        else {
          val a0 = v0.toArray
          val a1 = v1.toArray
          // channel-count homogeneity is enforced at the scan
          // (RecScan.read), but a direct caller could mix sources
          require(
            a0.length == a1.length,
            s"packet channel counts differ across a gap: ${a0.length} vs ${a1.length}"
          )
          (t0 + 1 until t1).iterator.map { t =>
            val vals = new Array[Short](a0.length)
            var c = 0
            while (c < a0.length) {
              // numpy interp1d + astype(int16): double math, truncate to 0
              vals(c) = (a0(c) + (t - t0).toDouble * (a1(c) - a0(c)) / d.toDouble).toShort
              c += 1
            }
            Row(t, vals.toSeq, segId, 1)
          }
        }
      }

      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = pending.hasNext || buf.hasNext
        override def next(): Row = {
          if (pending.hasNext) return pending.next()
          val r = buf.next()
          val ts = r.getLong(0)
          val vals = r.getSeq[Short](1)
          if (prevTs != Long.MinValue && ts - prevTs >= brk) seg += 1
          prevTs = ts
          // fused U2: drop the rest of a duplicate-ts run (sorted by
          // tie-break, so this row is the deterministic keeper)
          if (dedupB) {
            while (buf.hasNext && buf.head.getLong(0) == ts) buf.next()
          }
          // queue interpolations toward the next row (or boundary row)
          val nxt: Option[(Long, Seq[Short])] =
            if (buf.hasNext) Some((buf.head.getLong(0), buf.head.getSeq[Short](1)))
            else Option(nxtF(pid))
          nxt match {
            case Some((nt, nv)) if nt - ts > 1 && nt - ts <= maxGap + 1 =>
              pending = interpRows(ts, vals, nt, nv, seg)
            case _ =>
          }
          Row(ts, vals, seg, 0)
        }
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
