package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsp.{FilterDesign, SosFiltFilt}
import graft.io.{ExtractChannels, RecScan}
import graft.spikes.Spikes
import graft.ts.Sessionize

/** User-facing facade mirroring the reference's top-level workflow
  * (`JagularFileMap` → `extract_channels` → `filtfilt_mmap` →
  * `detect_spikes`, reference: jagular/io.py, utils.py, filtering.py,
  * spikes.py) so a jagular user can switch 1:1:
  *
  * {{{
  * val session = Graft.open(spark, Seq("a.rec", "b.rec"))
  * session.catalog.show()                   // file map + bounds
  * session.summary.show()                   // fs, duration w/ & w/o gaps
  * val ch = session.extractChannels("/out") // sanitized per-channel store
  * val filtered = session.filtfilt(ch, fl = Some(600), fh = Some(6000))
  * val spikes = Graft.detectSpikes(filtered.where($"channel" === 3),
  *   "ts", "value", threshold = 4.0)
  * }}}
  */
object Graft {

  def open(spark: SparkSession, paths: Seq[String]): RecSession =
    new RecSession(spark, paths)

  /** Live view of a recording in progress: a streaming DataFrame over
    * growing `.rec` files (or a session DIRECTORY — rollover files join
    * mid-stream). Same schema as [[RecSession.packets]]; compose with
    * `posexplode(values)` + `writeStream.partitionBy("channel")` for a
    * live extract_channels. `maxPacketsPerTrigger` bounds each
    * micro-batch's admission (file order) — the backpressure knob for
    * catch-up drains feeding stateful stages. */
  def openStream(
      spark: SparkSession,
      pathsOrDir: Seq[String],
      maxPacketsPerTrigger: Option[Long] = None
  ): DataFrame = {
    require(pathsOrDir.nonEmpty, "openStream needs at least one path")
    val reader0 = spark.readStream.format("rec")
    val reader = maxPacketsPerTrigger
      .fold(reader0)(n => reader0.option("maxPacketsPerTrigger", n.toString))
    pathsOrDir match {
      case Seq(one) => reader.load(one)
      case many =>
        // DataStreamReader.load has no varargs form; the source reads the
        // same JSON-array `paths` option the batch reader uses
        reader
          .option("paths", graft.io.rec.RecDataSourceV2.pathsOption(many))
          .load()
    }
  }

  /** The reference's `detect_spikes` composition
    * (jagular/spikes.py:142-186): MAD threshold → ≥2-consecutive
    * crossings → refractory censor → patch extraction. Returns the
    * exploded (peak_idx, offset, value) patches; `thresholdMultiplier`,
    * `patchHalfWidth` and `censorWidth` mirror the reference defaults. */
  def detectSpikes(
      signal: DataFrame,
      idxCol: String,
      valueCol: String,
      threshold: Double = 4.0,
      polarity: String = "neg",
      censorWidth: Long = 30L,
      patchHalfWidth: Int = 15,
      keys: Seq[String] = Nil
  ): DataFrame = {
    val thr = Spikes.madThreshold(signal, valueCol, threshold).first().getDouble(0)
    val peaks = Spikes.crossings(signal, idxCol, valueCol, thr, polarity, keys)
    val censored = Spikes.censor(peaks, idxCol, censorWidth, keys)
    Spikes.extractPatches(signal, censored, idxCol, valueCol, patchHalfWidth, keys)
  }
}

/** A multi-file `.rec` recording session — the reference's
  * `JagularFileMap` as a catalog-backed handle. */
final class RecSession(val spark: SparkSession, val paths: Seq[String]) {

  /** File map: per-file bounds sorted by start ts (io.py:9-96). */
  lazy val catalog: DataFrame = RecScan.catalog(spark, paths)

  /** Session stats: fs, start/stop, durations with and without
    * inter-file gaps (io.py:128-193). */
  lazy val summary: DataFrame = RecScan.sessionSummary(catalog)

  /** Stitched ordered packet scan (io.py:234-280). */
  def packets(channelSubset: Option[Seq[Int]] = None): DataFrame =
    RecScan.read(spark, paths, channelSubset = channelSubset)

  /** Time-bounded packet scan through the `rec` DataSource V2: the ts
    * predicate pushes down to whole-file pruning + in-file binary-search
    * packet ranges (the scalable form of `request_data`,
    * io.py:204-232 — only the matching byte ranges are read). */
  def packetsBetween(startTs: Long, stopTs: Long): DataFrame = {
    require(startTs <= stopTs, s"start $startTs > stop $stopTs")
    spark.read
      .format("rec")
      .load(paths: _*)
      .where(col("ts") >= startTs && col("ts") <= stopTs)
  }

  /** `extract_channels` (utils.py:392-549): sanitize + gap-fill + write
    * the per-channel columnar store; returns the written store. */
  def extractChannels(
      outDir: String,
      maxGapSize: Long = 150L,
      channelSubset: Option[Seq[Int]] = None
  ): DataFrame = {
    ExtractChannels.extractTo(spark, paths, outDir, maxGapSize, channelSubset)
    spark.read.parquet(outDir)
  }

  /** `filtfilt_mmap` (filtering.py:17-112): design a cheby2 SOS from the
    * band edges and zero-phase filter each (channel, epoch)
    * independently. Input is the extracted store (channel, ts, value);
    * if it already carries `segment_id` (extractChannels emits it), the
    * epochs are reused — no re-sessionization shuffle. */
  def filtfilt(
      channels: DataFrame,
      fl: Option[Double],
      fh: Option[Double],
      fs: Double = 30000.0,
      gpass: Double = 0.1,
      gstop: Double = 30.0,
      maxGapSize: Long = 150L
  ): DataFrame = {
    val sos = FilterDesign.iirdesignCheby2(fs, fl, fh, gpass, gstop)
    val seg =
      if (channels.columns.contains("segment_id")) channels
      else Sessionize.withSegmentIdKeyed(channels, "ts", maxGapSize + 2, Seq("channel"))
    SosFiltFilt.filtfiltPerSegment(
      seg.withColumn("value", col("value").cast("double")),
      sos,
      Seq("channel", "segment_id"),
      "ts",
      "value"
    )
  }
}
