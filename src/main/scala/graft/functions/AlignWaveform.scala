package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native sub-sample waveform alignment kernel (F5): the whole
  * argmax-peak → parabola-vertex → per-channel cubic-spline (or linear)
  * resample pipeline ([[graft.align.Align.alignWaveformToPeak]],
  * reference jagular/alignment.py:58-108) applied to an
  * `array<array<double>>` column without leaving Catalyst's array
  * representation.
  *
  * The external-Row UDF form it replaces ([[graft.align.Align.alignUdf]],
  * kept as the equivalence oracle — AlignWaveformSpec) deserializes every
  * waveform to `Seq[Seq[Double]]` and re-serializes the result: four
  * boxed copies of every sample around a numeric kernel that wants
  * primitive arrays. Here the samples go `ArrayData.toDoubleArray` →
  * kernel → `GenericArrayData(Array[Double])` — primitive end to end.
  *
  * CodegenFallback is deliberate: per-row work is an IIR spline pass +
  * basis evaluation per channel (same justification as [[MinHashSig]] —
  * the fallback's per-row boxing is noise next to the kernel work, and a
  * doGenCode of the spline would duplicate the Scala kernel in Java
  * strings for nothing).
  */
case class AlignWaveform(
    child: Expression,
    sBefore: Int,
    sAfter: Int,
    pad: Boolean,
    kind: String
) extends UnaryExpression
    with CodegenFallback {

  require(kind == "cubic" || kind == "linear", s"kind must be 'linear' or 'cubic', got $kind")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"align_waveform expects array<array<double>>, got $other")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "align_waveform"

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val numSamples = ad.numElements()
    val wf = new Array[Array[Double]](numSamples)
    var i = 0
    while (i < numSamples) { wf(i) = ad.getArray(i).toDoubleArray(); i += 1 }
    val out = graft.align.Align.alignWaveformToPeak(
      wf, sBefore = sBefore, sAfter = sAfter, pad = pad, kind = kind)
    val rows = new Array[Any](out.length)
    i = 0
    while (i < out.length) { rows(i) = new GenericArrayData(out(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): AlignWaveform =
    copy(child = newChild)
}

object AlignWaveform {
  def alignWaveform(c: Column, sBefore: Int, sAfter: Int, pad: Boolean, kind: String): Column =
    Bridge.column(AlignWaveform(Bridge.expression(c), sBefore, sAfter, pad, kind))
}
