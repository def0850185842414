package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, IntegerType}

/** Residual PQ encoder — the IVF-PQ index-build kernel: for a vector
  * already assigned to coarse cell `cell`, quantize the RESIDUAL
  * `x − centroid(cell)` against the residual codebooks. Subtracting the
  * coarse centroid removes the cluster-center component, so all code
  * resolution is spent on within-cell variation — the reason FAISS's
  * IVFPQ encodes residuals, and measurably the difference between
  * useless and usable recall on tightly clustered corpora (PqBench).
  *
  * Fused: the residual vector never materializes — the per-codeword
  * distance folds `(x(j) − c(j)) − w(j)` inline, one pass per (subspace,
  * codeword). Same argmin/tie/NaN semantics as [[PqEncode]]; NULL or
  * wrong-length input, or a cell outside the centroid table, yields
  * NULL. Codebooks and centroids are expression-embedded Seqs (a few
  * thousand doubles — see [[PqEncode]]'s size-class note).
  */
case class PqEncodeResidual(
    left: Expression,  // embedding array<float>
    right: Expression, // cell int
    centroids: Seq[Seq[Double]],
    codebooks: Seq[Seq[Seq[Double]]]
) extends BinaryExpression
    with CodegenFallback {

  require(codebooks.nonEmpty, "need at least one subspace")
  require(codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "1..256 codewords per subspace (codes are bytes)")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "ragged codebooks")
  require(centroids.nonEmpty &&
    centroids.forall(_.length == codebooks.length * codebooks.head.head.length),
    "centroid dim must equal m * dsub")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks.head.head.length

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_residual expects (array<float>, int), got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode_residual"
  override def nullable: Boolean = true

  override protected def nullSafeEval(emb: Any, cell: Any): Any = {
    val arr = emb.asInstanceOf[ArrayData]
    val c = cell.asInstanceOf[Int]
    if (arr.numElements() != m * dsub || c < 0 || c >= cents.length) return null
    val cent = cents(c)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val words = cb(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var w = 0
      while (w < words.length) {
        val word = words(w)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          if (arr.isNullAt(base + j)) return null
          val t = (arr.getFloat(base + j).toDouble - cent(base + j)) - word(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = w }
        w += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncodeResidual {

  /** Column-level surface. */
  def pqEncodeResidual(
      embedding: Column,
      cell: Column,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]
  ): Column =
    Bridge.column(PqEncodeResidual(
      Bridge.expression(embedding),
      Bridge.expression(cell),
      centroids.map(_.toSeq).toSeq,
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))
}
