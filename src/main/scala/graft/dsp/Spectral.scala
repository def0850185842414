package graft.dsp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed power spectra — the spectral-feature step both sides of
  * this engine want: band power per channel/segment for ephys (theta /
  * gamma ratios, the classic downstream of the filtfilt chain) and
  * frame-level spectral features for audio payloads ([[graft.ops.Multimodal]]).
  *
  * The signal is cut into consecutive non-overlapping `windowSize`-sample
  * windows per key (exact windows only — a partial tail is dropped, not
  * zero-padded), each window goes through the radix-2 FFT kernel
  * ([[graft.functions.FftPowerBins]]), and the one-sided bin powers come
  * back log₁₀-compressed (`round(log10(p + 1), 4)`): the compare-stable
  * form — absolute rounding of raw powers would make oracle/engine
  * float-path differences (butterflies vs direct sums) land on rounding
  * boundaries, while on the log scale the discrepancy is ~10⁻¹⁶.
  *
  * Scale shape: the per-key rank is a keyed window (keys partition the
  * corpus — channels × segments, the embarrassingly-parallel axis); the
  * window assembly is ONE exchange of (key, win) groups whose payload is
  * exactly `windowSize` doubles; every FFT is task-local. Bin k maps to
  * frequency k·fs/windowSize — band aggregation is a plain GROUP BY on
  * top.
  */
object Spectral {

  def windowPowerSpectra(
      signal: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      windowSize: Int
  ): DataFrame = {
    require(windowSize >= 2 && (windowSize & (windowSize - 1)) == 0,
      s"windowSize must be a power of two >= 2, got $windowSize")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val rn = row_number().over(w) - 1
    val windows = signal
      .withColumn("__rn", rn)
      .withColumn("win", (col("__rn") / windowSize).cast("long"))
      .withColumn("__j", (col("__rn") % windowSize).cast("int"))
      .groupBy(keys :+ col("win"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sort_array(collect_list(struct(col("__j"), col(valueCol).cast("double").as("__v"))))
          .as("__s"))
      .where(col("__n") === windowSize.toLong)
      .withColumn("__arr", transform(col("__s"), s => s.getField("__v")))
    windows
      .select(
        keys :+ col("win") :+
          posexplode(graft.functions.FftPowerBins.powerBins(col("__arr"))): _*)
      .withColumnRenamed("pos", "bin")
      .withColumn("log_power", round(log10(col("col") + lit(1.0)), 4))
      .drop("col")
  }
}
