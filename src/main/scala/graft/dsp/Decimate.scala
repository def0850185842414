package graft.dsp

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anti-aliased downsampling (G4, jagular/signal.py:3-40 — an API stub in
  * the reference — and the deprecated per-epoch "dumbsample",
  * jagular/deprecated.py:3-34). Semantics implemented the way the stub's
  * signature promises: per epoch, optional low-pass prefilter, then keep
  * every q-th sample relative to the epoch start.
  */
object Decimate {

  /** Per-segment decimation WITHOUT prefiltering ("dumbsample"): keeps
    * every q-th sample within each (keys) group, counting from the group's
    * first sample in ts order — plus, like the reference's deprecated
    * variant, always the last sample of the group. */
  def dumbsample(df: DataFrame, q: Int, tsCol: String, keys: Seq[String]): DataFrame = {
    require(q > 0, "q must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    df.withColumn("__rn", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .where(col("__rn") % q === 0 || col("__rn") === col("__n") - 1)
      .drop("__rn", "__n")
  }

  /** Full decimate: low-pass at (fsOut/2)·0.8 via the zero-phase SOS
    * kernel, then take every q-th sample per segment. The recommended
    * q ≤ 13 bound mirrors the reference docstring (signal.py:18-19). */
  def decimate(
      df: DataFrame,
      q: Int,
      tsCol: String,
      valueCol: String,
      keys: Seq[String],
      filterOrder: Int = 8
  ): DataFrame = {
    require(q > 0 && q <= 13, s"decimation factor q=$q out of (0, 13] — chain multiple passes instead")
    val cutoff = 0.8 / q // normalized to Nyquist
    val sos = FilterDesign.butter(filterOrder, Seq(cutoff), FilterDesign.Lowpass)
    val filtered = SosFiltFilt.filtfiltPerSegment(df, sos, keys, tsCol, valueCol)
    dumbsample(filtered, q, tsCol, keys)
  }
}
