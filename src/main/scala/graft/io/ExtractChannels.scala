package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ts.Dedup

/** The reference's flagship ETL query, `extract_channels`
  * (jagular/utils.py:392-549), as one declarative Spark plan:
  *
  *   rec scan → dedup-keep-first(ts) → sessionize(gap > maxGap → epoch
  *   boundary) → per-channel small-gap linear interpolation (int16
  *   truncation semantics) → columnar write partitioned by channel →
  *   post-write timestamp validation.
  *
  * The reference's per-block generator loop, across-block interpolation
  * state (utils.py:443-477) and file-per-channel sinks (utils.py:530-542)
  * all collapse into Catalyst-planned operators; `write.partitionBy
  * ("channel")` IS the file-per-channel layout.
  */
object ExtractChannels {

  /** Long-layout channel samples after sanitization + gap fill.
    *
    * @param maxGapSize largest missing-sample run still interpolated;
    *                   larger gaps become epoch boundaries
    *                   (jagular/utils.py:400-402).
    */
  def extract(
      spark: SparkSession,
      paths: Seq[String],
      maxGapSize: Long = 150L,
      channelSubset: Option[Seq[Int]] = None
  ): DataFrame = {
    // Headers + 2-packet bounds are parsed ONCE (RecScan.rankedMeta) and
    // shared between the disjointness check here and the scan itself.
    val meta = RecScan.rankedMeta(spark, paths)
    val raw = RecScan.readMeta(spark, meta, channelSubset = channelSubset)

    // The `.rec` scan's splits are already globally ts-ordered whenever
    // the files' time-ranges are pairwise disjoint (always true for a
    // single file; the normal acquisition layout for a session of
    // rollover files) — checked from the 2-packet-per-file bounds, NOT
    // assumed. In that case the gap-fill pass runs with ZERO shuffle and
    // zero cache: at 100 TB that is the difference between re-shuffling
    // the entire sample stream and never moving it. Overlapping files
    // fall back to the range shuffle, which handles any interleaving.
    val disjoint = meta.iterator.sliding(2).withPartial(false).forall { w =>
      w.head._3 <= w.last._2 // equal boundary ts allowed: dedup handles it
    }

    // U2 + W1 + J4/F1 + the per-channel explode, all fused at the packet
    // level (PacketGapFill): ONE pass over the packet stream applies
    // dedup-keep-first (tie-break = stream order), assigns epochs,
    // synthesizes interpolated packets (numpy interp1d + astype(int16)
    // truncation semantics), and emits the long-layout channel rows
    // directly. A separate Dedup.keepFirst step would hash-shuffle the
    // full packet payloads a second time — the widest data in flight in
    // the whole pipeline — and a separate posexplode would rebuild every
    // packet's array column only to take it apart again.
    PacketGapFill.fillAndSegmentExploded(
      raw,
      maxGapSize,
      dedupTieBreak = Seq("file_rank", "pos"),
      alreadySorted = disjoint
    )
  }

  /** Full pipeline incl. the partitioned columnar sink (S8) and the
    * post-write re-validation the reference performs
    * (jagular/utils.py:544-547). Returns the validation report.
    *
    * `zorderFiles = Some(n)` switches the sink from the
    * directory-per-channel layout to a FLAT z-clustered layout on
    * (channel, ts) in exactly `n` files
    * ([[graft.ops.ZOrder.writeClustered]]): the same (channel × time)
    * box pruning class via row-group min/max stats, without the
    * |channels| × |sessions| directory/small-file explosion a
    * large-probe-count store accumulates (measured layout trade in
    * COVERAGE.md / ChannelZOrderBench). The default stays the
    * reference's file-per-channel interchange layout. */
  def extractTo(
      spark: SparkSession,
      paths: Seq[String],
      outDir: String,
      maxGapSize: Long = 150L,
      channelSubset: Option[Seq[Int]] = None,
      zorderFiles: Option[Int] = None
  ): DataFrame = {
    val data = extract(spark, paths, maxGapSize, channelSubset)
    zorderFiles match {
      case Some(n) =>
        graft.ops.ZOrder.writeClustered(data, outDir, Seq("channel", "ts"), bits = 16, n)
      case None =>
        data
          .repartition(col("channel"))
          .sortWithinPartitions("channel", "ts")
          .write
          .mode("overwrite")
          .partitionBy("channel")
          .parquet(outDir)
    }

    val written = spark.read.parquet(outDir)
    val perChannel = written
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct("ts").as("n_distinct_ts"),
        min("ts").as("min_ts"),
        max("ts").as("max_ts")
      )
    perChannel.select(
      col("channel"),
      col("n_rows"),
      (col("n_rows") - col("n_distinct_ts")).as("n_dup_rows"),
      col("min_ts"),
      col("max_ts")
    )
  }
}
