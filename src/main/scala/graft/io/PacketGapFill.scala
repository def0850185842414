package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, InterpretedOrdering}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Fused sessionize + small-gap interpolation at the PACKET level (before
  * the per-channel explode): one pass computes, per partition, boundary
  * stats (first rows / last ts / local break count); the driver resolves
  * boundary breaks, segment-id offsets, and cross-partition interpolation
  * targets; a second pass assigns segment ids AND synthesizes
  * interpolated packets inline, interpolating the whole channel array per
  * missing timestamp.
  *
  * Semantics per the reference's sanitize/extract chain: dedup keep-first
  * (jagular/utils.py:323-390), epoch break at gap > maxGapSize
  * (utils.py:400-402), linear interpolation with numpy astype(int16)
  * truncation for fillable gaps (utils.py:459-528).
  *
  * Compared to the long-layout route (explode → window per channel →
  * union) this removes the widest shuffle of the extract pipeline: gap
  * logic runs on n_packets rows instead of n_packets × n_channels, and
  * the explode happens exactly once on the final stream.
  *
  * Two physical modes:
  *  - DEFAULT: range-repartition + local sort on ts (one shuffle of the
  *    packet payloads), for inputs in arbitrary order;
  *  - `alreadySorted = true`: the input's existing partitions are taken
  *    as a globally ts-ordered stream (the `.rec` scan's natural layout
  *    when file time-ranges are disjoint — see ExtractChannels) and the
  *    shuffle AND the cache are skipped entirely: both passes re-run the
  *    cheap deterministic scan. Duplicate-ts runs and gaps may then
  *    straddle partition boundaries; the boundary stats carry enough
  *    (previous partition's last ts, next partitions' first TWO distinct
  *    rows) to keep dedup-keep-first, break counting, and gap
  *    interpolation exact — spec-asserted equal to the shuffle mode.
  *    Sortedness is validated during the stats pass, not assumed — and
  *    with `dedupTieBreak` the tie-break columns are carried through the
  *    scan so the SAME pass also validates that equal-ts runs arrive in
  *    non-decreasing tie-break order (within and across partitions);
  *    either violation falls back to the shuffle mode, so keep-first
  *    resolves to the (ts, tieBreak...) keeper in BOTH modes, never to
  *    arbitrary stream order.
  *
  * Both passes run on Catalyst InternalRows end to end
  * (`Bridge.toInternalRdd` → `UnsafeRowWriter` → `internalCreateDataFrame`):
  * an external-Row formulation would box every channel sample twice
  * (Row.getSeq[Short] in, CatalystTypeConverters out), which dominated
  * extract_channels' wall time — the decode kernel itself runs at
  * memcpy-ish speed.
  */
object PacketGapFill {

  /** @param df (ts: Long, values: array<short>) — packet stream. Pass
    *           `dedupTieBreak` (e.g. file_rank, pos) to ALSO apply U2
    *           dedup-keep-first inside the same pass: fusing it here
    *           removes a whole hash shuffle of the packet payloads from
    *           the extract pipeline (the widest data in flight). In
    *           `alreadySorted` mode the input must already be ordered by
    *           (ts, tieBreak...), as the `.rec` scan is — the stats pass
    *           validates this (ts monotonicity AND tie-break order inside
    *           equal-ts runs) and falls back to the shuffle mode if it
    *           does not hold.
    * @return (ts, values, segment_id, interpolated) */
  def fillAndSegment(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int = 0,
      dedupTieBreak: Seq[String] = Nil,
      alreadySorted: Boolean = false
  ): DataFrame =
    run(df, maxGapSize, numPartitions, dedupTieBreak, exploded = false, alreadySorted)

  /** [[fillAndSegment]] with the per-channel explode FUSED into the same
    * pass: emits `(segment_id, ts, interpolated, channel, value)` rows
    * (five fixed-width fields, no per-packet array column, no Generate
    * operator) straight from the gap-fill iterator — the layout
    * extract_channels wants. */
  def fillAndSegmentExploded(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int = 0,
      dedupTieBreak: Seq[String] = Nil,
      alreadySorted: Boolean = false
  ): DataFrame =
    run(df, maxGapSize, numPartitions, dedupTieBreak, exploded = true, alreadySorted)

  /** Per-partition boundary stats from pass 1. `first2*` is the first row
    * whose ts EXCEEDS firstTs (null vals = no such row): with boundary-
    * straddling duplicate runs, the cross-partition interpolation target
    * for a partition ending at ts L is the first row anywhere after it
    * with ts > L — which is always one of (first, first2) of a following
    * partition. */
  private final case class Stat(
      pid: Int,
      firstTs: Long,
      firstVals: Array[Short],
      first2Ts: Long,
      first2Vals: Array[Short],
      lastTs: Long,
      breaks: Long,
      sortedOk: Boolean,
      // sorted-mode-with-dedup only (null otherwise): whether equal-ts
      // runs inside this partition kept tie-break order, plus the first
      // and last rows' tie-break values for the cross-boundary check
      tieOk: Boolean = true,
      firstTie: InternalRow = null,
      lastTie: InternalRow = null
  )

  private def run(
      df: DataFrame,
      maxGapSize: Long,
      numPartitions: Int,
      dedupTieBreak: Seq[String],
      exploded: Boolean,
      alreadySorted: Boolean
  ): DataFrame = {
    val spark = df.sparkSession
    require(
      df.columns.contains("ts") && df.columns.contains("values"),
      "need ts and values columns"
    )
    // epoch break at diff >= maxGap+2; fill when 1 < diff <= maxGap+1
    val breakAt = maxGapSize + 2
    val dedup = dedupTieBreak.nonEmpty

    // Default mode: one range shuffle + local sort by (ts, tieBreak...) so
    // the FIRST row of each duplicate run is the keeper; persist the
    // copied UnsafeRow RDD (not the DataFrame: the relation cache would
    // encode every packet into columnar batches only to decode them back)
    // as the correctness anchor fixing the sampled range partitioning
    // across the two passes (see Sessionize).
    // Sorted mode: no shuffle, no cache — the scan is deterministic and
    // cheap, so each pass just re-runs it.
    // sorted mode with fused dedup: carry the tie-break columns (ordinals
    // 2+; the fill pass only reads 0-1) so the stats pass can validate
    // the documented (ts, tieBreak...) order precondition for real
    val checkTies = alreadySorted && dedup
    val tieTypes: Seq[DataType] =
      if (checkTies) dedupTieBreak.map(c => df.schema(c).dataType) else Nil
    val internal =
      if (alreadySorted)
        Bridge.toInternalRdd(
          df.select((Seq(col("ts"), col("values")) ++ (if (dedup) dedupTieBreak.map(col) else Nil)): _*))
      else {
        val n =
          if (numPartitions > 0) numPartitions
          else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
        val sorted = df
          .select((Seq(col("ts"), col("values")) ++ dedupTieBreak.map(col)): _*)
          .repartitionByRange(n, col("ts"))
          .sortWithinPartitions((Seq(col("ts")) ++ dedupTieBreak.map(col)): _*)
        Bridge
          .toInternalRdd(sorted)
          .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val n = internal.getNumPartitions

    val stats = internal
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val tieOrd = if (checkTies) InterpretedOrdering.forSchema(tieTypes) else null
          // detached copy of the row's tie-break fields (the scan reuses
          // its UnsafeRow buffer across iterations)
          def tieOf(r: InternalRow): InternalRow =
            if (!checkTies) null
            else {
              val a = new Array[Any](tieTypes.length)
              var j = 0
              while (j < a.length) {
                val v = r.get(2 + j, tieTypes(j))
                a(j) = if (v == null) null else InternalRow.copyValue(v)
                j += 1
              }
              new GenericInternalRow(a)
            }
          val first = it.next()
          val firstTs = first.getLong(0)
          val firstVals = first.getArray(1).toShortArray()
          val firstTie = tieOf(first)
          var prevTie = firstTie
          var lastTie = firstTie
          var tieOk = true
          var first2Ts = Long.MinValue
          var first2Vals: Array[Short] = null
          var prev = firstTs
          var last = firstTs
          var raw = firstTs
          var breaks = 0L
          var sortedOk = true
          it.foreach { r =>
            val ts = r.getLong(0)
            if (ts < raw) sortedOk = false
            if (checkTies) {
              val cur = tieOf(r)
              if (ts == raw && tieOrd.compare(prevTie, cur) > 0) tieOk = false
              prevTie = cur
              lastTie = cur
            }
            raw = ts
            if (first2Vals == null && ts > firstTs) {
              first2Ts = ts
              first2Vals = r.getArray(1).toShortArray()
            }
            if (!(dedup && ts == prev)) {
              if (ts - prev >= breakAt) breaks += 1
              prev = ts; last = ts
            }
          }
          Iterator.single(Stat(pid, firstTs, firstVals, first2Ts, first2Vals, last, breaks,
            sortedOk, tieOk, firstTie, lastTie))
        }
      }
      .collect()
      .sortBy(_.pid)

    if (alreadySorted) {
      // sortedness was a CLAIM (catalog bounds can't see inside a file —
      // the reference's own sample recordings carry out-of-order
      // timestamps); the stats pass just checked it for real. If it does
      // not hold, fall back to the shuffle mode — one wasted cheap scan,
      // never a wrong answer.
      val tieOrd = if (checkTies) InterpretedOrdering.forSchema(tieTypes) else null
      val globallyOrdered = stats.forall(s => s.sortedOk && s.tieOk) &&
        stats.iterator.sliding(2).withPartial(false).forall { w =>
          w.head.lastTs < w.last.firstTs ||
            (w.head.lastTs == w.last.firstTs &&
              // an equal-ts run straddling the boundary keeps tie order
              (!checkTies || tieOrd.compare(w.head.lastTie, w.last.firstTie) <= 0))
        }
      if (!globallyOrdered)
        return run(df, maxGapSize, numPartitions, dedupTieBreak, exploded, alreadySorted = false)
    } else {
      // under range partitioning + local sort this is an invariant, not
      // an input property — a violation is a bug, not bad data
      require(stats.forall(_.sortedOk), "PacketGapFill: post-shuffle partition not ts-sorted")
    }

    // driver: segment-id offsets, the previous partition's last kept ts
    // (so boundary-straddling duplicate runs drop their tail), and the
    // cross-partition interpolation target
    val byPid = stats.map(s => s.pid -> s).toMap
    val offsets = new Array[Long](n)
    val prevLastTs = Array.fill(n)(Long.MinValue)
    var acc = 0L
    var prevLast = Long.MinValue
    (0 until n).foreach { pid =>
      prevLastTs(pid) = prevLast
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
    // interp target after partition p's last row: with dedup, the first
    // row anywhere after p with ts > lastTs(p) (a boundary dup's keeper
    // already emitted upstream); without dedup, the literal next row
    // (equal ts ⇒ d = 0 ⇒ no interp, matching in-partition behavior)
    val nextAfter = new Array[(Long, Array[Short])](n)
    (0 until n).foreach { pid =>
      byPid.get(pid).foreach { s =>
        var q = pid + 1
        var found: (Long, Array[Short]) = null
        while (found == null && q < n) {
          byPid.get(q).foreach { t =>
            if (!dedup) found = (t.firstTs, t.firstVals)
            else if (t.firstTs > s.lastTs) found = (t.firstTs, t.firstVals)
            else if (t.first2Vals != null && t.first2Ts > s.lastTs)
              found = (t.first2Ts, t.first2Vals)
          }
          q += 1
        }
        nextAfter(pid) = found
      }
    }
    val bc = spark.sparkContext.broadcast((offsets, nextAfter, prevLastTs, breakAt, maxGapSize))

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
      val (offs, nxtA, prevL, brk, maxGap) = bc.value
      val dedupB = dedup
      val buf = it0.map(r => (r.getLong(0), r.getArray(1).toShortArray())).buffered
      var seg = offs(pid)
      var prevTs = Long.MinValue
      // boundary-straddling duplicate run: these rows' keeper already
      // emitted in an earlier partition. Dropping them must still seed
      // prevTs, because this partition's local break count (offsets
      // accounting) started from this duplicated timestamp.
      if (dedupB && prevL(pid) != Long.MinValue) {
        while (buf.hasNext && buf.head._1 == prevL(pid)) {
          prevTs = buf.next()._1
        }
      }

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
          // fused U2: drop the rest of a duplicate-ts run (ordered by
          // tie-break, so this row is the deterministic keeper)
          if (dedupB) {
            while (buf.hasNext && buf.head._1 == ts) buf.next()
          }
          // queue interpolations toward the next row (or the
          // driver-resolved row after this partition)
          val nxt: Option[(Long, Array[Short])] =
            if (buf.hasNext) Some(buf.head) else Option(nxtA(pid))
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
