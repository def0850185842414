package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native exact-phrase match counter: the number of token positions
  * where the single-space-split token stream matches `terms`
  * consecutively, plus the first such 0-based position — ONE pass over
  * the UTF-8 bytes.
  *
  * Replaces [[graft.ops.Phrase.phraseMatches]]' interpreted HOF chain
  * (`filter(sequence(...), i -> element_at(toks,i+1)=t0 && ...)`):
  * Spark's higher-order functions are not codegen'd, so the old form
  * paid an interpreted lambda per start position × k `element_at`
  * array probes per document token — the DotF32/TokenSetCounts
  * argument, applied to phrase search (measured 1.60 → see
  * OPTIMIZATION_r19.md; q_phrase_search is a zero-exchange stateless
  * projection, so this per-row work WAS the query).
  *
  * Tokenization is `split(text, ' ')` with trailing empties kept
  * (Java regex split, limit −1) — identical to the HOF form; token
  * equality is raw UTF-8 byte equality, which is exactly Spark's
  * string equality. Overlapping matches count. Output is a struct
  * (n_hits LONG, first_pos INT nullable) — integers, so parity with
  * the HOF form (and the positional-postings serving form) is exact,
  * spec-pinned in PhraseSpec.
  *
  * CodegenFallback like the other kernels: per-row work dominates.
  */
case class PhraseHits(child: Expression, terms: Seq[String])
    extends UnaryExpression
    with CodegenFallback {

  require(terms.nonEmpty && terms.forall(_.nonEmpty), "phrase terms must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_hits expects a string arg, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("first_pos", IntegerType, nullable = true)))
  override def prettyName: String = "phrase_hits"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(t => UTF8String.fromString(t).getBytes).toArray

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token offsets: starts(i) .. ends(i) exclusive; split(' ', -1)
    // semantics — empties (leading / consecutive / trailing) kept
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == Space) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        starts(t) = s; ends(t) = i; t += 1; s = i + 1
      }
      i += 1
    }
    val k = termBytes.length
    var hits = 0L
    var firstPos = -1
    var p = 0
    val lastStart = nTok - k
    while (p <= lastStart) {
      var j = 0
      var ok = true
      while (ok && j < k) {
        val tb = termBytes(j)
        val ts = starts(p + j)
        if (ends(p + j) - ts != tb.length) ok = false
        else {
          var b = 0
          while (ok && b < tb.length) {
            if (bytes(ts + b) != tb(b)) ok = false
            b += 1
          }
        }
        j += 1
      }
      if (ok) {
        hits += 1L
        if (firstPos < 0) firstPos = p
      }
      p += 1
    }
    val row = new GenericInternalRow(2)
    row.setLong(0, hits)
    if (firstPos < 0) row.setNullAt(1) else row.setInt(1, firstPos)
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseHits {

  /** Column-level surface. */
  def phraseHits(text: Column, terms: Seq[String]): Column =
    Bridge.column(PhraseHits(Bridge.expression(text), terms))
}
