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
  ): DataFrame =
    powerWindows(signal, keyCols, orderCols, valueCol, windowSize)
      .select(
        keyCols.map(col) :+ col("win") :+
          posexplode(col("__p")): _*)
      .withColumnRenamed("pos", "bin")
      .withColumn("log_power", round(log10(col("col") + lit(1.0)), 4))
      .drop("col")

  /** Band-power rollup — the feature a pipeline actually consumes
    * (theta/gamma ratios, audio energy bands): RAW bin powers sum within
    * each `(name, loBin, hiBin)` band (inclusive, ascending-k fold —
    * spelled identically in the oracle) and log-compress like the
    * per-bin form. Output: keys…, win, band, log_power. */
  def windowBandPower(
      signal: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      windowSize: Int,
      bands: Seq[(String, Int, Int)]
  ): DataFrame = {
    require(bands.nonEmpty, "bands must be non-empty")
    bands.foreach { case (n, lo, hi) =>
      require(lo >= 0 && hi >= lo && hi <= windowSize / 2, s"bad band ($n, $lo, $hi)")
    }
    val base = powerWindows(signal, keyCols, orderCols, valueCol, windowSize)
    val bandStructs = bands.map { case (name, lo, hi) =>
      val sum = aggregate(
        slice(col("__p"), lo + 1, hi - lo + 1), lit(0.0), (acc, p) => acc + p)
      struct(lit(name).as("band"), round(log10(sum + lit(1.0)), 4).as("log_power"))
    }
    base
      .select(
        keyCols.map(col) :+ col("win") :+
          explode(array(bandStructs: _*)).as("__b"): _*)
      .select(
        keyCols.map(col) :+ col("win") :+
          col("__b.band").as("band") :+ col("__b.log_power").as("log_power"): _*)
  }

  /** STFT form: windows of `windowSize` whose starts advance by `hop`
    * (< windowSize ⇒ overlap; hop = windowSize/2 is the Welch-standard
    * 50 %). Each sample belongs to ≤ ⌈size/hop⌉ windows — membership is
    * a per-row generator (window w covers [w·hop, w·hop+size)), so the
    * duplication factor is the overlap ratio, known and bounded; the
    * rest of the plan is [[windowPowerSpectra]] unchanged. Output
    * schema identical (win = window index over starts). */
  def windowPowerSpectraHopped(
      signal: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      windowSize: Int,
      hop: Int
  ): DataFrame =
    powerWindows(signal, keyCols, orderCols, valueCol, windowSize, hop)
      .select(
        keyCols.map(col) :+ col("win") :+
          posexplode(col("__p")): _*)
      .withColumnRenamed("pos", "bin")
      .withColumn("log_power", round(log10(col("col") + lit(1.0)), 4))
      .drop("col")

  /** Welch magnitude-squared coherence between the two interleaved
    * channels of a keyed ordered stream (x = even stream positions,
    * y = odd — the 2-channel recording layout, same parity contract
    * as [[graft.ts.Xcorr]]): per frequency bin k,
    *
    *   coh(k) = |Σ_w X_w(k)·conj(Y_w(k))|² / (Σ_w |X_w(k)|² · Σ_w |Y_w(k)|²)
    *
    * over consecutive complete `windowSize`-sample windows of each
    * channel. Per-window complex bins come from the radix-2 kernel
    * ([[graft.functions.FftComplexBins]]) and are quantized to 4dp
    * DECIMAL before the cross products, so every Welch sum is exact —
    * engine and oracle walk identical arithmetic regardless of
    * window-summation order (the butterflies-vs-direct-DFT float gap
    * lives only under the 4dp rounding, where it is ~10⁻¹³ against a
    * 5·10⁻⁵ boundary).
    *
    * Shape at scale: ONE per-key exchange assembles (key, win) groups
    * of exactly 2·windowSize samples; the bin explode is ×(n/2+1) on
    * the window frame; the Welch rollup is map-side combinable and
    * bounded by keys × bins. Output: keys…, bin, n_windows,
    * coherence (6dp, NULL for a zero-power channel). */
  def coherence(
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
    val rn = (row_number().over(w) - 1).cast("long")
    val staged = signal
      .withColumn("__rn", rn)
      .withColumn("__ch", expr("__rn % 2").cast("int"))
      .withColumn("win", expr(s"(__rn div 2) div $windowSize"))
      .withColumn("__j", expr(s"(__rn div 2) % $windowSize").cast("int"))
    def chanArr(ch: Int) = transform(
      filter(col("__s"), s => s.getField("__ch") === ch),
      s => s.getField("__v"))
    val grouped = staged
      .groupBy(keys :+ col("win"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sort_array(collect_list(struct(
          col("__j"), col("__ch"), col(valueCol).cast("double").as("__v")))).as("__s"))
      .where(col("__n") === (2L * windowSize))
      .withColumn("__X", graft.functions.FftComplexBins.complexBins(chanArr(0)))
      .withColumn("__Y", graft.functions.FftComplexBins.complexBins(chanArr(1)))
      .withColumn("bin", explode(sequence(lit(0), lit(windowSize / 2))))
    // 4dp-quantized complex bins: Welch sums become exact decimals
    def q(arr: String, off: Int): Column =
      round(element_at(col(arr), col("bin") * 2 + off), 4).cast("decimal(18,4)")
    val terms = grouped.select(
      keys ++ Seq(col("bin"),
        q("__X", 1).as("xr"), q("__X", 2).as("xi"),
        q("__Y", 1).as("yr"), q("__Y", 2).as("yi")): _*)
    val roll = terms
      .groupBy(keys :+ col("bin"): _*)
      .agg(
        count(lit(1)).as("n_windows"),
        sum(col("xr") * col("yr") + col("xi") * col("yi")).as("__cre"),
        sum(col("xi") * col("yr") - col("xr") * col("yi")).as("__cim"),
        sum(col("xr") * col("xr") + col("xi") * col("xi")).as("__sxx"),
        sum(col("yr") * col("yr") + col("yi") * col("yi")).as("__syy"))
    val cre = col("__cre").cast("double")
    val cim = col("__cim").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    roll.select(
      keys ++ Seq(
        col("bin"), col("n_windows"),
        when(col("__sxx") > 0 && col("__syy") > 0,
          round((cre * cre + cim * cim) / (sxx * syy), 6)).as("coherence")): _*)
  }

  /** Shared window assembly + FFT: (keys…, win, __p = one-sided bin
    * powers) for complete windows only. `hop` = windowSize is the
    * non-overlapping fast path (win/j by plain division — no
    * generator); hop < windowSize explodes each sample into its
    * member windows. */
  private def powerWindows(
      signal: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      windowSize: Int,
      hop: Int = 0
  ): DataFrame = {
    require(windowSize >= 2 && (windowSize & (windowSize - 1)) == 0,
      s"windowSize must be a power of two >= 2, got $windowSize")
    val h = if (hop == 0) windowSize else hop
    require(h >= 1 && h <= windowSize, s"hop must be in [1, windowSize], got $h")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val rn = row_number().over(w) - 1
    val withWin =
      if (h == windowSize)
        signal
          .withColumn("__rn", rn)
          .withColumn("win", (col("__rn") / windowSize).cast("long"))
          .withColumn("__j", (col("__rn") % windowSize).cast("int"))
      else
        // sample rn belongs to windows w with w·h ≤ rn < w·h + size:
        // w ∈ [⌈(rn−size+1)/h⌉ clamped at 0, rn div h]
        signal
          .withColumn("__rn", rn)
          .withColumn("__wlo",
            greatest(lit(0L), -floor((lit(windowSize - 1).cast("long") - col("__rn")) / h).cast("long")))
          .withColumn("win", explode(sequence(col("__wlo"), (col("__rn") / h).cast("long"))))
          .withColumn("__j", (col("__rn") - col("win") * h).cast("int"))
          .drop("__wlo")
    withWin
      .groupBy(keys :+ col("win"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sort_array(collect_list(struct(col("__j"), col(valueCol).cast("double").as("__v"))))
          .as("__s"))
      .where(col("__n") === windowSize.toLong)
      .withColumn("__arr", transform(col("__s"), s => s.getField("__v")))
      .withColumn("__p", graft.functions.FftPowerBins.powerBins(col("__arr")))
      .select(keys :+ col("win") :+ col("__p"): _*)
  }
}
