package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String twin of [[CappedLongSet]]: a distinct-string collector that
  * SATURATES past a cap — the hot-bucket pre-shed for string-keyed
  * bucket operators ([[graft.ops.FuzzyJoin]]'s deletion-variant
  * buckets). A degenerate variant key (the empty-string variant every
  * length-≤-d string collapses to; the dense variants of very short
  * keys generally) would otherwise `collect_set` an unbounded member
  * list and pair-explode quadratically on ONE task. With this
  * aggregate the moment a (partial or merged) group exceeds `cap`
  * distinct members it collapses to a SATURATED marker — O(1) memory
  * from then on, and map-side partials dedup and saturate BEFORE the
  * exchange, so a mega-bucket never ships its members.
  *
  * eval: sorted (bytewise — UTF8_BINARY, matching `sort_array` on the
  * default collation) distinct array, or NULL when saturated, which
  * makes `cappedStringSet(x, cap).isNotNull` ≡
  * `size(collect_set(x)) <= cap` with bounded memory (spec-pinned
  * equivalence, FuzzyJoinSpec). Determinism: sorted output + a pure
  * distinct-count threshold — partitioning and merge order cannot
  * change either. NULL inputs are ignored (collect_set semantics).
  */
object CappedStringSet {

  /** Aggregation state: a distinct-string set, or `saturated` once it
    * has exceeded the cap (the set is then freed). */
  final class State(val cap: Int) {
    var set: java.util.HashSet[UTF8String] = new java.util.HashSet[UTF8String]()
    var saturated: Boolean = false

    def add(v: UTF8String): Unit = if (!saturated) {
      // clone: eval() results may alias a reused buffer
      if (!set.contains(v)) set.add(v.clone())
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

  /** Column-level surface: `cappedStringSet(col, cap)` — sorted
    * distinct string array, NULL once the group exceeds `cap`
    * distinct values. */
  def cappedStringSet(item: Column, cap: Int): Column =
    Bridge.column(
      CappedStringSetAgg(Bridge.expression(item), cap).toAggregateExpression())
}

case class CappedStringSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedStringSet.State]
    with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_string_set"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_string_set needs a STRING child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): CappedStringSet.State =
    new CappedStringSet.State(cap)

  override def update(b: CappedStringSet.State, input: InternalRow): CappedStringSet.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(
      b: CappedStringSet.State,
      other: CappedStringSet.State): CappedStringSet.State = {
    b.mergeIn(other); b
  }

  override def eval(b: CappedStringSet.State): Any =
    if (b.saturated) null
    else {
      val arr = new Array[AnyRef](b.set.size())
      val it = b.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr, new java.util.Comparator[AnyRef] {
        override def compare(a: AnyRef, c: AnyRef): Int =
          a.asInstanceOf[UTF8String].compareTo(c.asInstanceOf[UTF8String])
      })
      new GenericArrayData(arr)
    }

  override def serialize(b: CappedStringSet.State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(b.saturated)
    if (!b.saturated) {
      out.writeInt(b.set.size())
      val it = b.set.iterator()
      while (it.hasNext) {
        val bytes = it.next().getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedStringSet.State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new CappedStringSet.State(cap)
    if (in.readBoolean()) { b.saturated = true; b.set = null }
    else {
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        b.set.add(UTF8String.fromBytes(buf))
        i += 1
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedStringSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedStringSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CappedStringSetAgg =
    copy(child = newChild)
}
