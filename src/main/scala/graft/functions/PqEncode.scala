package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Product-quantization encoder: split a float embedding into `m`
  * contiguous subvectors and emit, per subspace, the index of the nearest
  * codeword (L2) — `m` bytes replacing `4·dim` (64× at dim=64, m=4).
  * This is THE memory/IO story for ANN beyond RAM scale: the serving
  * scan reads codes, not vectors (see [[graft.ops.Pq]]).
  *
  * Codebooks are an expression-embedded Seq: m·ksub·dsub doubles — a few
  * thousand values, the TokenSetCounts size class, far under the
  * broadcast threshold that [[ShingleSetOverlap]] documents (and Seq
  * keeps structural equality for plan canonicalization). Same argmin
  * semantics as [[ArgminCell]]: ties break to the LOWEST index via
  * strict `<`, NaN distances never win (any comparison with NaN is
  * false; a NaN in slot 0 stays only if nothing beats it). A NULL input
  * or a length ≠ m·dsub yields NULL (nullable, unlike ArgminCell's
  * fail-fast — an encoder must not silently file bad vectors under a
  * legal code). CodegenFallback: per-row work is m·ksub·dsub multiply-
  * adds, dwarfing row plumbing.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with CodegenFallback {

  require(codebooks.nonEmpty, "need at least one subspace")
  require(codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "1..256 codewords per subspace (codes are bytes)")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "ragged codebooks")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks.head.head.length

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != m * dsub) return null
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val words = cb(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          if (arr.isNullAt(base + j)) return null
          val t = arr.getFloat(base + j).toDouble - w(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {

  /** Column-level surface. */
  def pqEncode(embedding: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(
      Bridge.expression(embedding),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))
}
