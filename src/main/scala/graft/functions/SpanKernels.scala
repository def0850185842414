package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span-coverage kernels for the dup-span / dup-line family
  * (r19, guide §4): both replace interpreted higher-order-function
  * chains in per-row hot paths — Spark HOFs are not codegen'd (the
  * DotF32/TokenSetCounts/PhraseHits argument).
  *
  * [[CoveredLen]]: union length of the intervals [s, s+k) over an
  * ASCENDING starts array — the [[graft.ops.DedupDocs.dupSpans]]
  * coverage fold, previously an interpreted `aggregate()` lambda per
  * start. Exactly the fold's arithmetic: the first start contributes
  * k, each later start min(k, s − prev).
  *
  * [[StripTokens]]: drop every separator-delimited token covered by
  * some interval [s, s+k) of an ASCENDING starts array and rejoin the
  * survivors — the [[graft.ops.DedupDocs.stripDupSpans]] (sep=" ",
  * k=10) and [[graft.ops.DedupDocs.stripDupLines]] (sep=delim, k=1)
  * rebuild, previously an interpreted `filter(toks, i ->
  * !exists(starts, ...))` — O(tokens × starts) lambda invocations per
  * document. Tokenization is literal-separator split with empties
  * kept (`split(text, quote(sep), -1)` semantics); the rebuild joins
  * kept tokens with the same separator, byte-identical to
  * `concat_ws(sep, filter(...))`. NULL text yields ("", null, null) —
  * the exact null algebra of the HOF spelling; a NULL starts array is
  * the no-removals case.
  */
case class CoveredLen(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"covered_len expects array<int>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "covered_len"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var prev = -1
    var i = 0
    while (i < n) {
      val s = arr.getInt(i)
      acc += (if (prev < 0) k.toLong else math.min(k.toLong, (s - prev).toLong))
      prev = s
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CoveredLen {
  def coveredLen(starts: Column, k: Int): Column =
    Bridge.column(CoveredLen(Bridge.expression(starts), k))
}

case class StripTokens(left: Expression, right: Expression, k: Int, sep: String)
    extends BinaryExpression
    with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")
  require(sep.nonEmpty, "separator must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_tokens expects (string, array<int>), got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = true),
    StructField("n_removed", LongType, nullable = true)))
  override def prettyName: String = "strip_tokens"
  override def nullable: Boolean = false

  @transient private lazy val sepBytes: Array[Byte] = UTF8String.fromString(sep).getBytes

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) {
      // concat_ws over a null array is "", size(null) is null — the
      // HOF spelling's exact null algebra
      val row = new GenericInternalRow(3)
      row.update(0, UTF8String.EMPTY_UTF8)
      row.setNullAt(1)
      row.setNullAt(2)
      return row
    }
    val st = right.eval(input)
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val sb = sepBytes
    // token boundaries: leftmost non-overlapping literal separator
    // matches, empties kept (Pattern.quote split, limit -1)
    val tokStarts = new scala.collection.mutable.ArrayBuffer[Int](16)
    val tokEnds = new scala.collection.mutable.ArrayBuffer[Int](16)
    var s = 0
    var i = 0
    while (i <= bytes.length - sb.length) {
      var m = 0
      while (m < sb.length && bytes(i + m) == sb(m)) m += 1
      if (m == sb.length) {
        tokStarts += s; tokEnds += i
        i += sb.length
        s = i
      } else i += 1
    }
    tokStarts += s; tokEnds += bytes.length
    val nTok = tokStarts.length

    val starts = if (st == null) null else st.asInstanceOf[ArrayData]
    val nSt = if (starts == null) 0 else starts.numElements()
    // sweep: starts ascending; token i is covered iff some s <= i has
    // i < s + k (an s > i cannot cover i)
    val out = new Array[Byte](bytes.length)
    var outLen = 0
    var kept = 0
    var j = 0
    var maxEnd = -1L
    var ti = 0
    while (ti < nTok) {
      while (j < nSt && starts.getInt(j) <= ti) {
        val e = starts.getInt(j).toLong + k
        if (e > maxEnd) maxEnd = e
        j += 1
      }
      if (ti >= maxEnd) {
        if (kept > 0) {
          System.arraycopy(sb, 0, out, outLen, sb.length); outLen += sb.length
        }
        val l = tokEnds(ti) - tokStarts(ti)
        System.arraycopy(bytes, tokStarts(ti), out, outLen, l); outLen += l
        kept += 1
      }
      ti += 1
    }
    val row = new GenericInternalRow(3)
    row.update(0, UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen)))
    row.setLong(1, nTok.toLong)
    row.setLong(2, (nTok - kept).toLong)
    row
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StripTokens {
  def stripTokens(text: Column, starts: Column, k: Int, sep: String): Column =
    Bridge.column(StripTokens(Bridge.expression(text), Bridge.expression(starts), k, sep))
}
