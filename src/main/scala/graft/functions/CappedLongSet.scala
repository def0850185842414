package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distinct-long collection that SATURATES past a cap — the exact-pairs
  * pre-shed ([[graft.ops.Text.winnowOverlapPairs]] and kin): bucket
  * operators only ever want the member list of buckets with at most
  * `maxDocFreq` distinct members (stop-phrase buckets carry no dedup
  * signal and quadratic pair cost), so collecting a mega-bucket's full
  * list just to size-filter it away is wasted shuffle, memory, and
  * merge time. This aggregate keeps at most cap+1 distinct values per
  * group; the moment a (partial or merged) set exceeds the cap it
  * collapses to a SATURATED marker — O(1) memory from then on, and
  * map-side partials already dedup and saturate before the exchange.
  *
  * eval: sorted distinct array, or NULL when saturated — exactly
  * `sort_array(collect_set(x))` for groups within the cap and "drop
  * me" for groups the df filter would discard, which makes
  * `cappedSet(x, cap).isNotNull` ≡ `size(collect_set(x)) <= cap`
  * with bounded memory (spec-pinned equivalence, WinnowSpec).
  *
  * Determinism: the output is a SORTED set, so partitioning and merge
  * order cannot change it; saturation is a pure threshold on distinct
  * count, also order-free. NULL inputs are ignored (collect_set
  * semantics).
  */
object CappedLongSet {

  /** Aggregation state: a distinct-long set, or `saturated` once it
    * has exceeded the cap (the set is then freed). */
  final class State(val cap: Int) {
    var set: java.util.HashSet[java.lang.Long] = new java.util.HashSet[java.lang.Long]()
    var saturated: Boolean = false

    def add(v: Long): Unit = if (!saturated) {
      set.add(v)
      if (set.size() > cap) { saturated = true; set = null }
    }

    def mergeIn(other: State): Unit = {
      if (saturated) ()
      else if (other.saturated) { saturated = true; set = null }
      else {
        val it = other.set.iterator()
        while (!saturated && it.hasNext) add(it.next())
      }
    }
  }

  /** Column-level surface: `cappedSet(col, cap)` — sorted distinct
    * array, NULL once the group exceeds `cap` distinct values. */
  def cappedSet(item: Column, cap: Int): Column =
    Bridge.column(
      CappedLongSetAgg(Bridge.expression(item), cap).toAggregateExpression())
}

case class CappedLongSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedLongSet.State]
    with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_long_set"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_long_set needs a BIGINT child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): CappedLongSet.State = new CappedLongSet.State(cap)

  override def update(b: CappedLongSet.State, input: InternalRow): CappedLongSet.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedLongSet.State, other: CappedLongSet.State): CappedLongSet.State = {
    b.mergeIn(other); b
  }

  override def eval(b: CappedLongSet.State): Any =
    if (b.saturated) null
    else {
      val arr = new Array[Long](b.set.size())
      val it = b.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(b: CappedLongSet.State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(b.saturated)
    if (!b.saturated) {
      out.writeInt(b.set.size())
      val it = b.set.iterator()
      while (it.hasNext) out.writeLong(it.next())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedLongSet.State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new CappedLongSet.State(cap)
    if (in.readBoolean()) { b.saturated = true; b.set = null }
    else {
      val n = in.readInt()
      var i = 0
      while (i < n) { b.set.add(in.readLong()); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedLongSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedLongSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CappedLongSetAgg =
    copy(child = newChild)
}
