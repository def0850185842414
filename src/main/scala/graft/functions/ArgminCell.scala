package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native IVF cell assignment: argmin of squared L2 distance from a
  * float embedding to a FIXED centroid table — the per-vector kernel of
  * [[graft.ops.Ivf.assignCells]], which runs over EVERY corpus vector at
  * index-build time. The external-Row UDF it replaces (kept as the
  * equivalence oracle, ArgminCellSpec) deserialized each embedding to a
  * boxed `Seq[Float]`; here the loop reads the `ArrayData` floats
  * directly against a flattened primitive centroid matrix.
  *
  * Centroids ride IN the expression (nLists × dim doubles — a few KiB
  * for any practical IVF config; they are driver-trained constants, not
  * data), so the expression serializes once per task like a broadcast —
  * as a Seq, so two plans with equal centroids are `semanticEqual`
  * (array-typed params compare by reference and would defeat plan
  * canonicalization; the [[PqEncode]] pattern). Ties break to the
  * LOWEST cell index (strict `<` update), matching the UDF and the
  * driver-side training loop. Malformed input FAILS FAST: an embedding
  * shorter than the centroid dim raises and kills the job — this kernel
  * runs at INDEX-BUILD time, where silently filing a bad vector under a
  * legal cell would corrupt the index for every query after; contrast
  * [[PqEncode]], whose NULL-on-malformed suits a per-row encoder whose
  * output is independently checkable. CodegenFallback: per-row work
  * is an nLists × dim distance sweep (same family as [[MinHashSig]]).
  */
case class ArgminCell(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression
    with CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.map(_.length).distinct.length == 1, "ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_cell expects array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_cell"

  private val dim = centroids.head.length
  // flattened row-major: cache-friendly sweep, one bounds check pattern
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var j = 0
      while (j < dim) { f(c * dim + j) = row(j); j += 1 }
      c += 1
    }
    f
  }

  override protected def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    // the UDF form faulted on short embeddings (index out of bounds);
    // UnsafeArrayData would instead read garbage, so check explicitly
    require(emb.numElements() >= dim,
      s"embedding dim ${emb.numElements()} < centroid dim $dim")
    val n = dim
    val m = flat
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var j = 0
      val off = c * dim
      while (j < n) {
        val t = emb.getFloat(j) - m(off + j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminCell =
    copy(child = newChild)
}

object ArgminCell {
  def argminCell(c: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(ArgminCell(Bridge.expression(c), centroids.map(_.toVector).toVector))
}
