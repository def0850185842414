package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Mergeable first+second vector moments over an `array<float>` column —
  * the ONE corpus aggregate PCA needs ([[graft.ops.Pca.fit]]): count,
  * per-coordinate sums, and the upper triangle of Σ x xᵀ, accumulated in
  * double. The buffer is a flat `Array[Double]` of `1 + d + d(d+1)/2`
  * slots (d=64 → 2 145 doubles ≈ 17 KB), map-side combinable, so the
  * exchange carries one buffer per partition — O(d²), independent of
  * row count. That is the 100 TB shape: covariance never materializes
  * per-row outer products (an explode formulation would be O(n·d²)
  * rows).
  *
  * Rows whose vector is null, has a null element, or differs from `dim`
  * are SKIPPED (not zero-filled) — count reflects accumulated rows only.
  * Output: array<double> [n, sum_0..sum_{d-1}, upper-tri row-major].
  */
case class MomentsAccum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  private val triLen = dim * (dim + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moments_accum expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "moments_accum"

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + dim + triLen)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return b
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return b; i += 1 }
    b(0) += 1.0
    var t = 1 + dim
    i = 0
    while (i < dim) {
      val xi = x.getFloat(i).toDouble
      b(1 + i) += xi
      var j = i
      while (j < dim) {
        b(t) += xi * x.getFloat(j).toDouble
        t += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    new GenericArrayData(b.map(Double.box))

  override def serialize(b: Array[Double]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { out.putDouble(b(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < b.length) { b(i) = in.getDouble(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MomentsAccum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentsAccum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MomentsAccum =
    copy(child = newChild)
}

object MomentsAccum {

  /** Column-level surface. */
  def moments(embedding: Column, dim: Int): Column =
    Bridge.column(
      MomentsAccum(Bridge.expression(embedding), dim).toAggregateExpression())
}
