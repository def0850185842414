package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-sided COMPLEX spectrum of a sample window: the same radix-2
  * kernel as [[FftPowerBins]] (shared `fftInPlace`), but returning the
  * bins interleaved `[re₀, im₀, re₁, im₁, …, re_{n/2}, im_{n/2}]` —
  * the form cross-spectral consumers (coherence, phase) need, where
  * squaring away the phase first would destroy the signal.
  *
  * Same contract as the power form: NULL input, a null element, an
  * empty window, or a non-power-of-two length yields NULL; same
  * CodegenFallback justification (the butterfly kernel dwarfs boxing).
  * SpectralSpec pins it against the naive DFT and against
  * [[FftPowerBins]] (re² + im² must reproduce the power bins exactly —
  * identical float path, not just close).
  */
case class FftComplexBins(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fft_complex_bins expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "fft_complex_bins"

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
    val out = new Array[Any](2 * (n / 2 + 1))
    var k = 0
    while (k <= n / 2) {
      out(2 * k) = re(k)
      out(2 * k + 1) = im(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FftComplexBins {

  def complexBins(window: Column): Column =
    Bridge.column(FftComplexBins(Bridge.expression(window)))

  /** Arity-checked SQL builder (the [[DotF32.builder]] contract). */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => FftComplexBins(c)
    case other =>
      throw Bridge.analysisError(
        s"fft_complex_bins expects exactly 1 argument, got ${other.length}")
  }
}
