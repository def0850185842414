package graft.dsp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-phase FIR filtering as PURE window arithmetic.
  *
  * The reference's zero-phase path is IIR sosfiltfilt (filtering.py:
  * 114-194) — a sequential recurrence that needs a per-segment kernel
  * ([[SosFiltFilt]]). A symmetric (linear-phase) FIR achieves the same
  * "no phase distortion" property with a CENTERED windowed weighted sum,
  * which is fully declarative: lag/lead columns inside whole-stage
  * codegen, one shuffle on the partition key, and — unlike the IIR
  * kernel — bit-reproducible by a SQL oracle. This is the engine's
  * preferred filtering form at scale; the IIR kernel remains for exact
  * reference parity (cheby2/butter presets).
  *
  * Edge semantics: missing neighbors beyond the stream edge contribute 0
  * (zero-padding). The reference instead trims filter transients via
  * overlapped chunks; for the FIR form the transient region is exactly
  * the first/last `numTaps/2` samples, which callers can drop if they
  * need the reference's interior-only guarantee.
  */
object Fir {

  /** Hamming-windowed-sinc lowpass, odd `numTaps`, `cutoff` normalized to
    * Nyquist (0 < cutoff < 1). Coefficients normalized to unity DC gain.
    * (Standard windowed-sinc design, e.g. Oppenheim & Schafer §7.5 —
    * public-textbook math, no library.) */
  def lowpassCoeffs(numTaps: Int, cutoff: Double): Array[Double] = {
    require(numTaps % 2 == 1, "numTaps must be odd (symmetric, zero-phase)")
    require(cutoff > 0 && cutoff < 1, "cutoff must be in (0, 1) of Nyquist")
    if (numTaps == 1) return Array(1.0) // identity; the Hamming term is 0/0 here
    val m = numTaps / 2
    val h = Array.tabulate(numTaps) { n =>
      val k = n - m
      val ideal =
        if (k == 0) cutoff
        else math.sin(math.Pi * cutoff * k) / (math.Pi * k)
      val hamming = 0.54 - 0.46 * math.cos(2.0 * math.Pi * n / (numTaps - 1))
      ideal * hamming
    }
    val s = h.sum
    h.map(_ / s)
  }

  /** Centered FIR column: `sum_j coeffs(M+j) * value[i+j]` over the keyed
    * `orderCol` window; edges zero-padded. Left-to-right accumulation in
    * tap order — an SQL oracle spelling the same sum reproduces it
    * bit-for-bit. */
  def firColumn(
      coeffs: Array[Double],
      valueCol: String,
      keys: Seq[String],
      orderCol: String
  ): Column = {
    require(coeffs.length % 2 == 1, "coeffs must have odd length")
    val m = coeffs.length / 2
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val terms = (-m to m).map { j =>
      // value[i+j]: j < 0 is the PRECEDING neighbor (lag), j > 0 the
      // following one (lead) — matters only for asymmetric taps
      val neighbor =
        if (j < 0) lag(col(valueCol), -j).over(w)
        else if (j > 0) lead(col(valueCol), j).over(w)
        else col(valueCol)
      lit(coeffs(m + j)) * coalesce(neighbor, lit(0.0))
    }
    terms.reduce(_ + _)
  }

  /** Zero-phase FIR smoothing: adds/overwrites `valueCol` with the
    * filtered signal. One shuffle on `keys`; everything else codegen. */
  def zeroPhase(
      df: DataFrame,
      coeffs: Array[Double],
      keys: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame =
    df.withColumn(valueCol, firColumn(coeffs, valueCol, keys, orderCol))

  /** Anti-aliased FIR decimation (G4 in declarative form): lowpass at
    * `0.8/q` of Nyquist with `numTaps` taps, then keep every q-th sample
    * per key (row-position based, like the reference's per-epoch
    * decimation counting from the segment start). */
  def decimateFir(
      df: DataFrame,
      q: Int,
      numTaps: Int,
      keys: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    require(q > 0 && q <= 13, s"decimation factor q=$q out of (0, 13]")
    val coeffs = lowpassCoeffs(numTaps, 0.8 / q)
    val filtered = zeroPhase(df, coeffs, keys, orderCol, valueCol)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    filtered
      .withColumn("__rn", row_number().over(w) - 1)
      .where(col("__rn") % q === 0)
      .drop("__rn")
  }

  /** The SQL spelling of [[firColumn]] for the DuckDB oracle: identical
    * tap order, identical literals (`Double.toString` round-trips), so
    * the per-row double arithmetic is bit-identical. */
  def firSql(
      coeffs: Array[Double],
      valueExpr: String,
      partitionBy: String,
      orderBy: String
  ): String = {
    val m = coeffs.length / 2
    (-m to m)
      .map { j =>
        val c = coeffs(m + j)
        val neighbor =
          if (j < 0) s"COALESCE(lag($valueExpr, ${-j}) OVER (PARTITION BY $partitionBy ORDER BY $orderBy), 0.0)"
          else if (j > 0) s"COALESCE(lead($valueExpr, $j) OVER (PARTITION BY $partitionBy ORDER BY $orderBy), 0.0)"
          else valueExpr
        s"$c * $neighbor"
      }
      .mkString(" + ")
  }
}
