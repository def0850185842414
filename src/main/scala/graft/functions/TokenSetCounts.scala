package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-set token membership counter: for each of `sets`, how
  * many of the document's single-space-split tokens (empty tokens
  * included, `split(text, ' ')` semantics) are members — ONE pass over
  * the UTF-8 bytes, replacing one interpreted
  * `size(filter(split(text, ' '), t -> t.isin(...)))` HOF chain PER SET
  * (stopword ratios, language-ID marker scores —
  * [[graft.ops.Text.qualityScores]] / [[graft.ops.Text.langId]]).
  *
  * Token occurrences count every time they appear (the HOF filter keeps
  * duplicates), and a token counts at most once per set. Sets are tiny
  * (stopword/marker lists), so membership is a length-gated linear byte
  * compare against the precomputed UTF-8 forms. Same family as
  * [[MinHashSig]]; CodegenFallback because per-row work dominates.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression
    with CodegenFallback {

  require(sets.nonEmpty, "need at least one token set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_counts expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_counts"

  @transient private lazy val members: Array[Array[Array[Byte]]] =
    sets.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  private val Space = ' '.toByte

  private def tokenInSet(bytes: Array[Byte], start: Int, end: Int, set: Array[Array[Byte]]): Boolean = {
    val len = end - start
    var m = 0
    while (m < set.length) {
      val cand = set(m)
      if (cand.length == len) {
        var j = 0
        while (j < len && bytes(start + j) == cand(j)) j += 1
        if (j == len) return true
      }
      m += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Long](members.length)
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        var g = 0
        while (g < members.length) {
          if (tokenInSet(bytes, s, i, members(g))) counts(g) += 1
          g += 1
        }
        s = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetCounts {

  /** Column-level surface. */
  def tokenSetCounts(text: Column, sets: Seq[Seq[String]]): Column =
    Bridge.column(TokenSetCounts(Bridge.expression(text), sets))
}
