package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** K-minimum-values sketch state: the `k` smallest DISTINCT longs seen
  * so far — the classic KMV distinct-count sketch (Bar-Yossef et al.
  * 2002; Beyer et al. 2007 "On Synopses for Distinct-Value Estimation
  * under Multiset Operations"). With a fixed deterministic hash the
  * sketch — unlike HLL — is fully reproducible by an independent
  * engine (`ORDER BY hash LIMIT k` spells the same k values in SQL),
  * which is what makes a hash-exact oracle possible.
  *
  * O(k) bounded state per group at any corpus size, map-side partials
  * merge by set-union-then-trim, and the output (ascending array of
  * ≤ k values) is independent of partitioning and merge order. NULLs
  * ignored (collect_set semantics). The estimator itself lives in
  * [[graft.ops.Cardinality]] — eval returns the raw sketch so callers
  * can also union sketches across groups (KMV unions losslessly:
  * merge + trim, exactly the `merge` path).
  */
object KMinValues {

  final class State(val k: Int) {
    // sorted distinct; bounded at k by evicting the current max
    val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit =
      if (set.size() < k) { set.add(v); () }
      else if (v < set.last()) { if (set.add(v)) { set.remove(set.last()); () } }

    def mergeIn(other: State): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  /** `kMinValues(col, k)`: ascending array of the k smallest distinct
    * values of a BIGINT column within the group (fewer if the group
    * has fewer distinct values). */
  def kMinValues(item: Column, k: Int): Column =
    Bridge.column(
      KMinValuesAgg(Bridge.expression(item), k).toAggregateExpression())
}

case class KMinValuesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KMinValues.State]
    with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "k_min_values"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"k_min_values needs a BIGINT child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KMinValues.State = new KMinValues.State(k)

  override def update(b: KMinValues.State, input: InternalRow): KMinValues.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KMinValues.State, other: KMinValues.State): KMinValues.State = {
    b.mergeIn(other); b
  }

  override def eval(b: KMinValues.State): Any = {
    val arr = new Array[Long](b.set.size())
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(b: KMinValues.State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.set.size())
    val it = b.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KMinValues.State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new KMinValues.State(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.set.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinValuesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinValuesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KMinValuesAgg =
    copy(child = newChild)
}
