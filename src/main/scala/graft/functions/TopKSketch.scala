package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter summary: bounded-memory frequent
  * items over a string stream, with a PER-SUMMARY error certificate.
  *
  * Why it exists: [[graft.ops.Text.topNgrams]] is exact — its one
  * exchange carries every distinct n-gram, which is the correct answer
  * at oracle scale and an impossible one at 100 TB (trillions of
  * distinct grams). This aggregate is the bounded-memory path: each
  * partition keeps at most 2×capacity counters, the exchange carries
  * capacity-bounded SUMMARIES instead of the gram universe, and the
  * answer comes with its own honesty bound.
  *
  * Algorithm (Misra-Gries with amortized batch compaction; merge rule
  * from Agarwal et al. 2012, "Mergeable Summaries"): counts grow
  * exactly until the map exceeds 2×capacity, then the (capacity+1)-th
  * largest count c* is subtracted from every counter, non-positive
  * counters are dropped (at most `capacity` survive, by definition of
  * c*), and c* accumulates into the summary's `deducted` total D.
  * Merging sums counters key-wise, sums D, and re-compacts. Invariant,
  * any merge order: for every surviving key,
  * `est ≤ true_count ≤ est + D`, and any key with
  * `true_count > D` is guaranteed present. D = 0 ⟺ no compaction ever
  * fired ⟺ every count is EXACT (the regime the oracle row pins; the
  * eviction regime is spec-pinned against exact recounts).
  *
  * Determinism: counts are sums, so in the D = 0 regime results are
  * bit-stable under any partitioning (spec-pinned). Under compaction
  * the SET of surviving low-count keys may vary with merge order; the
  * bounds above hold regardless — the sketch trades bit-stability for
  * memory, which is the honest contract of a sketch (the exact
  * operator remains the deterministic one).
  */
object TopKSketch {

  /** One summary: string key → estimated count, plus the deduction
    * certificate. */
  final class Summary(val capacity: Int) {
    val counts = new java.util.HashMap[UTF8String, Array[Long]](capacity * 2)
    var deducted: Long = 0L

    def add(key: UTF8String, inc: Long): Unit = {
      val c = counts.get(key)
      if (c != null) c(0) += inc
      else {
        // own the bytes: row-backed UTF8Strings alias reusable buffers
        val owned = UTF8String.fromBytes(
          java.util.Arrays.copyOf(key.getBytes, key.numBytes()))
        counts.put(owned, Array(inc))
        if (counts.size() > capacity * 2) compact()
      }
    }

    /** Subtract the (capacity+1)-th largest count from everyone, drop
      * the non-positive: ≤ capacity survivors, ≥ capacity removals —
      * amortized O(1) per insert. */
    private def compact(): Unit = {
      val m = counts.size()
      val all = new Array[Long](m)
      val it = counts.values().iterator()
      var i = 0
      while (it.hasNext) { all(i) = it.next()(0); i += 1 }
      java.util.Arrays.sort(all) // ascending
      val threshold = all(m - capacity - 1) // (capacity+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nc = e.getValue()(0) - threshold
        if (nc <= 0) eit.remove() else e.getValue()(0) = nc
      }
      deducted += threshold
    }

    def mergeIn(other: Summary): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = counts.get(e.getKey)
        if (c != null) c(0) += e.getValue()(0)
        else {
          counts.put(e.getKey, e.getValue()) // other's entries are owned
          if (counts.size() > capacity * 2) compact()
        }
      }
      deducted += other.deducted
    }
  }
}

/** The Catalyst aggregate over [[TopKSketch.Summary]]. Output: an array
  * of (item, est, err) structs sorted by (est desc, item asc), where
  * `err` is the summary's deduction total D (`true ∈ [est, est + err]`;
  * err = 0 means exact). Rank/limit/threshold live in the consuming
  * DataFrame plan ([[graft.ops.Text.topNgramsSketch]]). */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKSketch.Summary]
    with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"

  override def createAggregationBuffer(): TopKSketch.Summary =
    new TopKSketch.Summary(capacity)

  override def update(b: TopKSketch.Summary, input: InternalRow): TopKSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(b: TopKSketch.Summary, other: TopKSketch.Summary): TopKSketch.Summary = {
    b.mergeIn(other); b
  }

  override def eval(b: TopKSketch.Summary): Any = {
    val entries = new java.util.ArrayList[(UTF8String, Long)](b.counts.size())
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries.add((e.getKey, e.getValue()(0)))
    }
    val arr = entries.toArray(new Array[(UTF8String, Long)](0))
    java.util.Arrays.sort(arr, (a: (UTF8String, Long), c: (UTF8String, Long)) => {
      val byEst = java.lang.Long.compare(c._2, a._2) // est desc
      if (byEst != 0) byEst else a._1.compareTo(c._1) // item asc
    })
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      val row = new GenericInternalRow(3)
      row.update(0, arr(i)._1)
      row.setLong(1, arr(i)._2)
      row.setLong(2, b.deducted)
      out(i) = row.asInstanceOf[InternalRow]
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKSketch.Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(b.deducted)
    out.writeInt(b.counts.size())
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKSketch.Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKSketch.Summary(capacity)
    b.deducted = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      b.counts.put(UTF8String.fromBytes(kb), Array(in.readLong()))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

object SpaceSavingTopK {

  /** Column-level surface. */
  def topkSketch(item: Column, capacity: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(item), capacity).toAggregateExpression())
}
