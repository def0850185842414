package graft.align

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-sample spike-waveform peak alignment (F3/F4/F5,
  * jagular/alignment.py:58-108): find the channel with the largest peak,
  * fit a parabola through the 3 samples around the integer peak, and
  * resample every channel on a grid centered at the parabola vertex via
  * cubic-spline (or linear) interpolation; optional one-sample
  * edge-replication padding.
  *
  * Waveform layout: `Array[Array[Double]]` of shape
  * (num_samples, num_channels), matching the reference.
  */
object Align {

  /** F3: parabola coefficients through 3 points (closed-form Lagrange —
    * no solver needed; reference uses np.linalg.solve on the 3×3
    * Vandermonde, jagular/alignment.py:7-26). */
  def parabolaCoeffs(x: (Double, Double, Double), y: (Double, Double, Double)): (Double, Double, Double) = {
    val (x0, x1, x2) = x
    val (y0, y1, y2) = y
    val d0 = (x0 - x1) * (x0 - x2)
    val d1 = (x1 - x0) * (x1 - x2)
    val d2 = (x2 - x0) * (x2 - x1)
    val a = y0 / d0 + y1 / d1 + y2 / d2
    val b = -(y0 * (x1 + x2) / d0 + y1 * (x0 + x2) / d1 + y2 * (x0 + x1) / d2)
    val c = y0 * x1 * x2 / d0 + y1 * x0 * x2 / d1 + y2 * x0 * x1 / d2
    (a, b, c)
  }

  /** F4: vertex location −b/2a (jagular/alignment.py:28-41). */
  def parabolaPeakLoc(a: Double, b: Double): Double = -b / (2.0 * a)

  /** F5 kernel: align one waveform. Defaults mirror the reference:
    * peak channel = argmax over all (channel, sample); s_before =
    * i_intpeak; s_after = num_samples − s_before. */
  def alignWaveformToPeak(
      waveform: Array[Array[Double]],
      iIntPeak: Int = -1,
      channel: Int = -1,
      sBefore: Int = -1,
      sAfter: Int = -1,
      pad: Boolean = false,
      kind: String = "cubic"
  ): Array[Array[Double]] = {
    val numSamples = waveform.length
    val numChannels = waveform(0).length

    val (peakIdx, peakCh) =
      if (iIntPeak >= 0) {
        require(channel >= 0, "if i_intpeak is given, the channel must also be specified")
        (iIntPeak, channel)
      } else {
        // per-channel argmax, then channel with the largest peak value (W7)
        var bestCh = 0; var bestVal = Double.NegativeInfinity; var bestIdx = 0
        var c = 0
        while (c < numChannels) {
          var idx = 0; var v = Double.NegativeInfinity
          var s = 0
          while (s < numSamples) {
            if (waveform(s)(c) > v) { v = waveform(s)(c); idx = s }
            s += 1
          }
          if (v > bestVal) { bestVal = v; bestCh = c; bestIdx = idx }
          c += 1
        }
        (bestIdx, bestCh)
      }

    val sb = if (sBefore >= 0) sBefore else peakIdx
    val sa = if (sAfter >= 0) sAfter else numSamples - sb

    // the parabola fit needs 3 samples with an interior peak; clamp edge
    // peaks one sample inward (the reference assumes interiority and
    // would fault here), and degrade to the integer peak for waveforms
    // too short to fit at all
    val sFracPeak =
      if (numSamples < 3) peakIdx.toDouble
      else {
        val peakIdxSafe = math.min(math.max(peakIdx, 1), numSamples - 2)
        val (a, b, _) = parabolaCoeffs(
          (peakIdxSafe - 1.0, peakIdxSafe.toDouble, peakIdxSafe + 1.0),
          (waveform(peakIdxSafe - 1)(peakCh), waveform(peakIdxSafe)(peakCh), waveform(peakIdxSafe + 1)(peakCh))
        )
        parabolaPeakLoc(a, b)
      }

    val (wf, fracPeak) =
      if (pad) (waveform.head +: waveform :+ waveform.last, sFracPeak + 1.0)
      else (waveform, sFracPeak)

    interpAround(wf, fracPeak, sb, sa, kind)
  }

  /** Resample every channel at `s_fracpeak − s_before … + s_after − 1`
    * (jagular/alignment.py:43-56). */
  def interpAround(
      waveform: Array[Array[Double]],
      sFracPeak: Double,
      sBefore: Int,
      sAfter: Int,
      kind: String
  ): Array[Array[Double]] = {
    val numSamples = waveform.length
    val numChannels = waveform(0).length
    val n = sBefore + sAfter
    val xs = Array.tabulate(n)(i => sFracPeak - sBefore + i)
    val out = Array.ofDim[Double](n, numChannels)
    var c = 0
    while (c < numChannels) {
      val col = Array.tabulate(numSamples)(s => waveform(s)(c))
      kind match {
        case "cubic" =>
          val coeffs = Spline.cspline1d(col)
          var i = 0
          while (i < n) { out(i)(c) = Spline.evalAt(coeffs, xs(i)); i += 1 }
        case "linear" =>
          var i = 0
          while (i < n) { out(i)(c) = Spline.evalLinear(col, xs(i)); i += 1 }
        case other => throw new IllegalArgumentException(s"kind must be 'linear' or 'cubic', got $other")
      }
      c += 1
    }
    out
  }

  /** External-Row UDF formulation — kept as the plumbing oracle for the
    * native kernel (AlignWaveformSpec asserts bit-identical output): both
    * run [[alignWaveformToPeak]], so any divergence is array-conversion
    * plumbing, which is exactly what the spec pins. */
  def alignUdf(sBefore: Int, sAfter: Int, pad: Boolean, kind: String)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (wf: Seq[Seq[Double]]) =>
      alignWaveformToPeak(
        wf.map(_.toArray).toArray,
        sBefore = sBefore,
        sAfter = sAfter,
        pad = pad,
        kind = kind
      ).map(_.toSeq).toSeq
    }

  /** Whole-column alignment over a DataFrame — native kernel
    * ([[graft.functions.AlignWaveform]]): primitive arrays end to end
    * instead of the UDF's boxed Seq[Seq[Double]] round-trip. */
  def alignColumn(df: DataFrame, waveformCol: String, sBefore: Int, sAfter: Int,
      pad: Boolean = false, kind: String = "cubic"): DataFrame =
    df.withColumn(
      waveformCol,
      graft.functions.AlignWaveform.alignWaveform(col(waveformCol), sBefore, sAfter, pad, kind))

  /** [[alignColumn]] via the UDF — equivalence-spec + SigBench surface. */
  private[graft] def alignColumnUdf(df: DataFrame, waveformCol: String, sBefore: Int, sAfter: Int,
      pad: Boolean = false, kind: String = "cubic"): DataFrame =
    df.withColumn(waveformCol, alignUdf(sBefore, sAfter, pad, kind)(col(waveformCol)))
}
