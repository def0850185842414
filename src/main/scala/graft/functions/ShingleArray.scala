package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-shingle kernel: the
  * `split → transform(sequence)(slice + concat_ws) → array_distinct`
  * chain ([[graft.ops.DedupDocs.shingles]]) as one pass over the
  * document's UTF-8 bytes. A k-token shingle joined by single spaces IS a
  * contiguous byte range of the original buffer (the split separator is
  * the join separator), so each shingle is a zero-copy UTF8String view of
  * that range — the HOF chain instead materialized a token array, k-token
  * slices, joined strings, and an O(shingles) distinct pass per document.
  *
  * BIT-IDENTICAL to the HOF formulation (ShingleArraySpec): empty tokens
  * from space runs are tokens, first-occurrence order is preserved
  * (array_distinct semantics), and documents with fewer than k tokens
  * yield an EMPTY array (explode drops them, matching the HOF form's
  * when-guard). Same family as [[MinHashSig]] — CodegenFallback because
  * the per-row work (token scan + hash-set dedup) dwarfs fallback boxing.
  *
  * `dedup = false` emits EVERY occurrence in order (the HOF chain minus
  * `array_distinct`) — the shape corpus-level n-gram COUNTING needs
  * ([[graft.ops.Text.topNgrams]]), where dropping repeats would drop the
  * counts themselves.
  */
case class ShingleArray(child: Expression, k: Int, dedup: Boolean = true)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_array expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        starts += s; ends += i; s = i + 1
      }
      i += 1
    }
    val t = starts.length
    if (t < k) return new GenericArrayData(Array.empty[Any])
    val seen = if (dedup) new java.util.HashSet[UTF8String](t * 2) else null
    val out = new scala.collection.mutable.ArrayBuffer[Any](t - k + 1)
    var sh = 0
    while (sh <= t - k) {
      val sgl = UTF8String.fromBytes(bytes, starts(sh), ends(sh + k - 1) - starts(sh))
      if (seen == null || seen.add(sgl)) out += sgl
      sh += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {

  /** Column-level surface. */
  def shingleArray(text: Column, k: Int, dedup: Boolean = true): Column =
    Bridge.column(ShingleArray(Bridge.expression(text), k, dedup))

  /** Arity-checked SQL builder: `shingle_array(text, k[, dedup])` with
    * foldable literals. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
      ShingleArray(t, k)
    case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _),
        org.apache.spark.sql.catalyst.expressions.Literal(d: Boolean, _)) =>
      ShingleArray(t, k, d)
    case Seq(_, other) =>
      throw Bridge.analysisError(
        s"shingle_array k must be an integer literal, got ${other.sql}")
    case other =>
      throw Bridge.analysisError(
        s"shingle_array expects (text, k) or (text, k, dedup) with literal args, got ${other.length} args")
  }
}
