package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar/array helpers mapping the reference's numeric utilities
  * onto codegen'd column expressions. */
object Funcs {

  /** F6: SpikeGadgets bit→µV scaling, `4096.0 / 2**15`
    * (jagular/spikes.py:87-90). */
  val BitToMicrovolts: Double = 4096.0 / 32768.0
  def bitsToMicrovolts(c: Column): Column = c * lit(BitToMicrovolts)

  /** F10: zero-pad an array column to fixed length n
    * (np.pad(..., 'constant'), jagular/spikes.py:420-423). Arrays longer
    * than n are truncated (slice), matching a fixed patch size. */
  def padTo(arr: Column, n: Int, fill: Column = lit(0.0)): Column =
    slice(concat(arr, array_repeat(fill, n)), 1, n)

  /** F8: float range, the reference's exact construction
    * (jagular/utils.py:17-22): `num = floor((stop-start)/step)` points of
    * `linspace(start, stop, num, endpoint=False)` — i.e. spacing
    * `(stop-start)/num`, NOT `step`, when the range is not divisible.
    * Empty ranges (num <= 0) yield an empty array. */
  def frange(start: Column, stop: Column, step: Column): Column = {
    val num = floor((stop - start) / step).cast("long")
    when(num <= 0, array().cast("array<double>"))
      .otherwise(
        transform(
          sequence(lit(0L), num - 1),
          i => start + i.cast("double") * (stop - start) / num.cast("double")
        )
      )
  }
}
