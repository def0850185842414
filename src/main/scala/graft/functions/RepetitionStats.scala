package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram repetition counter (the Gopher-style repetition
  * quality signals): for each requested n, over the document's
  * single-space-split tokens, the total n-gram occurrence count, the
  * count of the MOST frequent n-gram, and the number of occurrences
  * belonging to n-grams seen more than once — ONE pass over the UTF-8
  * bytes for all n's, replacing an explode → groupBy(doc, gram) →
  * groupBy(doc) double exchange per n.
  *
  * Exactness: `split(text, ' ')` and `join(' ')` are inverses (every
  * space is a separator, empty tokens included), so the raw byte span
  * from the start of token i to the end of token i+n−1 IS the joined
  * n-gram string — n-grams are counted by open-addressing on the span
  * hash with byte-exact comparison on collision, no hash-collision
  * false merges. Output layout: `[total, top, dup]` per n, concatenated
  * in the given order. Same family as [[MinHashSig]]/[[TokenSetCounts]];
  * CodegenFallback because per-row work (a per-row hash table over all
  * n-gram spans) dominates row plumbing.
  */
case class RepetitionStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression
    with CodegenFallback {

  require(ns.nonEmpty, "need at least one n-gram size")
  require(ns.forall(_ >= 1), s"n-gram sizes must be >= 1, got $ns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundaries: split(text, ' ') semantics — nTok = spaces + 1,
    // empty tokens (leading/trailing/double spaces, empty text) included
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == Space) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == Space) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length

    val out = new Array[Long](3 * ns.length)
    var g = 0
    while (g < ns.length) {
      val n = ns(g)
      val total = nTok - n + 1
      if (total > 0) {
        // open-addressing table over n-gram byte spans; power-of-two
        // capacity >= 2*total keeps the load factor under 0.5
        var cap = 4
        while (cap < total * 2) cap <<= 1
        val mask = cap - 1
        val slotOff = new Array[Int](cap)
        val slotLen = new Array[Int](cap)
        val slotCnt = new Array[Int](cap)
        java.util.Arrays.fill(slotOff, -1)
        var k = 0
        while (k < total) {
          val off = starts(k)
          val len = ends(k + n - 1) - off
          var h = 1
          var j = off
          while (j < off + len) { h = 31 * h + bytes(j); j += 1 }
          h ^= (h >>> 16)
          var s = h & mask
          var placed = false
          while (!placed) {
            if (slotOff(s) < 0) {
              slotOff(s) = off; slotLen(s) = len; slotCnt(s) = 1; placed = true
            } else if (slotLen(s) == len) {
              var j2 = 0
              val o2 = slotOff(s)
              while (j2 < len && bytes(o2 + j2) == bytes(off + j2)) j2 += 1
              if (j2 == len) { slotCnt(s) += 1; placed = true }
              else s = (s + 1) & mask
            } else s = (s + 1) & mask
          }
          k += 1
        }
        var top = 0L
        var dup = 0L
        var s2 = 0
        while (s2 < cap) {
          val c = slotCnt(s2)
          if (c > 0) {
            if (c > top) top = c
            if (c > 1) dup += c
          }
          s2 += 1
        }
        out(3 * g) = total
        out(3 * g + 1) = top
        out(3 * g + 2) = dup
      } // else: all three stay 0 — a doc shorter than n has no n-grams
      g += 1
    }
    new GenericArrayData(out.map(c => c: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** Column-level surface: `[total, top, dup]` per n, concatenated. */
  def repetitionStats(text: Column, ns: Seq[Int]): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text), ns))
}
