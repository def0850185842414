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
  * duplicates), and a token counts at most once per set. Membership is
  * a hash-set probe on a zero-copy UTF8String view of the token bytes —
  * O(1) per (token, set) whether the set is a 2-word stopword list or a
  * 100k-entry tokenizer vocabulary ([[graft.ops.Text.oovRate]]; the
  * original length-gated linear member scan made large vocabularies
  * O(tokens × |set|)). Same family as [[MinHashSig]]; CodegenFallback
  * because per-row work dominates.
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

  @transient private lazy val memberSets: Array[java.util.HashSet[UTF8String]] =
    sets.map { set =>
      val hs = new java.util.HashSet[UTF8String](set.size * 2)
      set.foreach(m => hs.add(UTF8String.fromString(m)))
      hs
    }.toArray

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Long](memberSets.length)
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        // zero-copy view of the token bytes — UTF8String hashes and
        // compares by content
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        var g = 0
        while (g < memberSets.length) {
          if (memberSets(g).contains(tok)) counts(g) += 1
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
