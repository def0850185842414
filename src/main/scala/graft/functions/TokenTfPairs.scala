package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency kernel: the document's DISTINCT
  * single-space-split tokens with their occurrence counts, in
  * first-occurrence order — `(tok, tf)` structs, one byte pass.
  *
  * This exists for [[graft.ops.Bm25.buildIndex]]: term frequency is a
  * PER-DOCUMENT quantity, so computing it before the exchange turns the
  * postings build from explode-all-occurrences → shuffle → aggregate
  * into explode-distinct-pairs → shuffle → write: the wire carries one
  * row per DISTINCT (doc, term) and the shuffle-side aggregate
  * disappears entirely (there is nothing left to combine — each row is
  * already complete). The classic map-side-combine argument, executed
  * in a kernel where Spark's planner cannot see it.
  *
  * Tokenization is `split(text, ' ')` semantics (empty tokens included,
  * so `tf` sums to the document length); equivalence with the
  * explode+groupBy formulation is spec-pinned (Bm25Spec).
  *
  * CodegenFallback like the other kernels: per-row work dominates.
  */
case class TokenTfPairs(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_tf_pairs expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_tf_pairs"

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // first-occurrence-ordered counts; UTF8String.fromBytes views are
    // cheap (no copy) and hash/compare by content
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
        s = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(2)
      row.update(0, e.getKey)
      row.setLong(1, e.getValue()(0))
      out(j) = row.asInstanceOf[InternalRow]
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenTfPairs {

  /** Column-level surface. */
  def tokenTfPairs(text: Column): Column =
    Bridge.column(TokenTfPairs(Bridge.expression(text)))
}
