package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Power spectrum of one sample window: in-place iterative radix-2 FFT
  * over the `array<double>` window, returning the `n/2 + 1` one-sided
  * bin powers `|X_k|²` (real input ⇒ the upper half mirrors). The heavy
  * per-row trig/butterfly math keeps this on CodegenFallback — the same
  * justification as [[SimHash64]]: the kernel dwarfs the boxing, and a
  * generated-code copy would be unreviewable.
  *
  * Contract: NULL input, a null element, an empty window, or a
  * non-power-of-two length yields NULL (window assembly upstream is
  * responsible for exact windows; a partial tail window must be
  * filtered, not zero-padded silently). SpectralSpec pins the kernel
  * bit-for-bit against a naive O(n²) DFT and Parseval's theorem.
  */
case class FftPowerBins(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fft_power_bins expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "fft_power_bins"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0 || (n & (n - 1)) != 0) return null
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      re(i) = arr.getDouble(i)
      i += 1
    }
    FftPowerBins.fftInPlace(re, im)
    val out = new Array[Any](n / 2 + 1)
    var k = 0
    while (k <= n / 2) {
      out(k) = re(k) * re(k) + im(k) * im(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FftPowerBins {

  def powerBins(window: Column): Column =
    Bridge.column(FftPowerBins(Bridge.expression(window)))

  /** Arity-checked SQL builder (the [[DotF32.builder]] contract). */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => FftPowerBins(c)
    case other =>
      throw Bridge.analysisError(
        s"fft_power_bins expects exactly 1 argument, got ${other.length}")
  }

  /** Iterative radix-2 Cooley-Tukey, in place; `re.length` must be a
    * power of two. Twiddles are computed per stage from `Math.cos/sin`
    * of exact binary-fraction angles — deterministic across JVMs. */
  private[graft] def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var off = 0
        while (off < len / 2) {
          val a = base + off
          val b = a + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) = re(a) + vr; im(a) = im(a) + vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          off += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Naive O(n²) DFT power bins — the independent reference for
    * SpectralSpec and the generated SQL oracle's spelling. */
  private[graft] def dftPowerBins(x: Array[Double]): Array[Double] = {
    val n = x.length
    (0 to n / 2).map { k =>
      var reS = 0.0
      var imS = 0.0
      var j = 0
      while (j < n) {
        val ang = -2.0 * math.Pi * j * k / n
        reS += x(j) * math.cos(ang)
        imS += x(j) * math.sin(ang)
        j += 1
      }
      reS * reS + imS * imS
    }.toArray
  }
}
