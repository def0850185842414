package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous-segment detection (the reference's core operator,
  * `get_contiguous_segments`, jagular/utils.py:124-248): given a stream of
  * integral timestamps, break wherever the forward difference is >= a gap
  * threshold (the reference uses `2*step`), and emit per-segment bounds
  * `[min_ts, max_ts + step)`.
  *
  * Two physical strategies, same semantics:
  *
  *  - [[withSegmentIdKeyed]]: when a partition key exists (user, channel,
  *    tetrode...), a plain keyed window — `lag` → break flag → running sum.
  *    Shuffles once on the key; scales horizontally with key cardinality,
  *    which is the normal shape at 100 TB (many channels / users).
  *
  *  - [[withSegmentIdGlobal]]: for a single global stream. A naive
  *    `Window.orderBy(ts)` collapses everything into ONE task, which dies
  *    at scale; instead we range-repartition by ts, detect breaks locally
  *    per partition with `lag` over (partition_id), and resolve the
  *    partition-boundary breaks + segment-id offsets on the driver from a
  *    tiny (num_partitions)-row summary. Two jobs, no single-task sort.
  */
object Sessionize {

  /** Keyed sessionize: adds `segment_id` (0-based per key). Break where
    * `ts - lag(ts) >= gapThreshold`. */
  def withSegmentIdKeyed(
      df: DataFrame,
      tsCol: String,
      gapThreshold: Long,
      keys: Seq[String]
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val brk = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) >= gapThreshold,
      1L
    ).otherwise(0L)
    df.withColumn(
      "segment_id",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
  }

  /** Global sessionize without a single-task global window.
    *
    * Pass 1: range-repartition + local sort by ts (Spark's external range
    * sort — each task holds one contiguous ts range). Persisted so pass 2
    * sees the same partitioning.
    * Pass 2: per-partition summary (first_ts, last_ts, local_break_count)
    * — collected to the driver: O(num_partitions) rows.
    * Driver: a break also occurs at a partition boundary iff
    * `first_ts(p) - last_ts(p-1) >= gap`; prefix-sum gives each partition
    * its global segment-id offset.
    * Pass 3: re-walk each partition assigning
    * `offset(p) + running local break count`.
    */
  def withSegmentIdGlobal(
      df: DataFrame,
      tsCol: String,
      gapThreshold: Long,
      numPartitions: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.storage.StorageLevel

    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val cols = df.columns
    val tsIdx = cols.indexOf(tsCol)
    require(tsIdx >= 0, s"no column $tsCol")

    // NOTE: the persist is a CORRECTNESS anchor, not a cache: the range
    // partitioner samples boundaries at job time, so pass 2/3 must see
    // the exact partitioning pass 1 summarized. MEMORY_AND_DISK spills
    // rather than evicts, keeping the partitioning stable at any scale.
    // Catalyst InternalRows end to end (no external-Row encode/decode);
    // UnsafeRow iterators reuse the row object, hence the copy before
    // the persist.
    val sortedDf = df
      .repartitionByRange(n, col(tsCol))
      .sortWithinPartitions(col(tsCol))
    val sorted = Bridge
      .toInternalRdd(sortedDf)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Pass 2: tiny per-partition summary.
    case class PartStat(pid: Int, first: Long, last: Long, breaks: Long, rows: Long)
    val stats = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var first = Long.MinValue; var last = Long.MinValue
        var breaks = 0L; var rows = 0L; var prev = Long.MinValue
        it.foreach { r =>
          val ts = r.getLong(tsIdx)
          if (rows == 0L) first = ts
          else if (ts - prev >= gapThreshold) breaks += 1
          prev = ts; last = ts; rows += 1
        }
        if (rows == 0L) Iterator.empty
        else Iterator.single(PartStat(pid, first, last, breaks, rows))
      }
      .collect()
      .sortBy(_.pid)

    // Driver: offsets. Segment ids are counts of breaks before the row.
    val offsets = new Array[Long](n)
    val boundaryBreak = new Array[Boolean](n)
    var acc = 0L
    var prevLast: Option[Long] = None
    val byPid = stats.map(s => s.pid -> s).toMap
    (0 until n).foreach { pid =>
      byPid.get(pid) match {
        case Some(s) =>
          val bb = prevLast.exists(pl => s.first - pl >= gapThreshold)
          boundaryBreak(pid) = bb
          offsets(pid) = acc + (if (bb) 1L else 0L)
          acc = offsets(pid) + s.breaks
          prevLast = Some(s.last)
        case None =>
          offsets(pid) = acc
      }
    }

    val bcOffsets = df.sparkSession.sparkContext.broadcast((offsets, gapThreshold))
    val baseSchema = sortedDf.schema
    val baseTypes = baseSchema.fields.map(_.dataType)
    val nBase = baseSchema.fields.length
    val outSchema = org.apache.spark.sql.types.StructType(
      baseSchema.fields :+
        org.apache.spark.sql.types.StructField("segment_id", org.apache.spark.sql.types.LongType, nullable = false)
    )
    val outRdd = sorted.mapPartitionsWithIndex { (pid, it) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      val (offs, gap) = bcOffsets.value
      var seg = offs(pid)
      var prev = Long.MinValue
      var firstRow = true
      it.map { r =>
        val ts = r.getLong(tsIdx)
        if (!firstRow && ts - prev >= gap) seg += 1
        firstRow = false
        prev = ts
        val vals = new Array[Any](nBase + 1)
        var i = 0
        while (i < nBase) { vals(i) = r.get(i, baseTypes(i)); i += 1 }
        vals(nBase) = seg
        new GenericInternalRow(vals): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, outRdd, outSchema)
  }

  /** Per-segment bounds in the reference's convention:
    * `(segment_id, start = min ts, stop = max ts + step, n)` —
    * half-open `[start, stop)` (jagular/utils.py:199-208). */
  def segments(dfWithSegId: DataFrame, tsCol: String, step: Long): DataFrame =
    dfWithSegId
      .groupBy("segment_id")
      .agg(
        min(col(tsCol)).as("start"),
        (max(col(tsCol)) + lit(step)).as("stop"),
        count(lit(1)).as("n")
      )

  /** Gap lengths between consecutive segments (A6, jagular/utils.py:115-122):
    * `gap_before = start - lag(stop)` (null for the first segment).
    * Segment streams are usually catalog-sized, but at 100 TB short
    * epochs can number in the millions — the keyless path therefore goes
    * through the [[OrderedStream]] neighbor exchange instead of a
    * single-task global window. */
  def gapLengths(segmentsDf: DataFrame, keys: Seq[String] = Nil): DataFrame =
    if (keys.isEmpty)
      OrderedStream
        .withNeighbors(segmentsDf, "segment_id", Seq("stop"))
        .withColumn("gap_before", col("start") - col("__prev_stop"))
        .drop("__prev_segment_id", "__next_segment_id", "__prev_stop", "__next_stop")
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("segment_id"))
      segmentsDf.withColumn("gap_before", col("start") - lag(col("stop"), 1).over(w))
    }

  /** Median forward-step estimate (A9, jagular/utils.py:189-190). Returns a
    * 1-row DataFrame `(step)`. Uses exact median to stay oracle-exact;
    * keyless case goes through the [[OrderedStream]] neighbor exchange. */
  def medianStep(df: DataFrame, tsCol: String, keys: Seq[String] = Nil): DataFrame = {
    val withPrev =
      if (keys.isEmpty)
        OrderedStream
          .withNeighbors(df, tsCol, Nil)
          .withColumn("d", col(tsCol) - col(s"__prev_$tsCol"))
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
        df.withColumn("d", col(tsCol) - lag(col(tsCol), 1).over(w))
      }
    withPrev
      .where(col("d").isNotNull)
      .agg(expr("median(d)").as("step"))
  }
}
