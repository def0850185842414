package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NfcNormalize]] — a plain object (no case-class
  * companion) so the Scala static forwarder exists and generated Java
  * can call `graft.functions.NfcKernel.nfc(...)` directly. */
object NfcKernel {

  /** NFC-normalize a UTF8String. Fast path: a pure-ASCII buffer (every
    * byte >= 0) is NFC by construction — returned as-is with no String
    * round-trip, so the overwhelmingly-ASCII bulk of a web corpus pays
    * one branchy byte scan, not an allocation. Non-ASCII falls back to
    * `java.text.Normalizer` (the JDK's ICU-equivalent implementation of
    * Unicode Standard Annex #15). */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition step of text cleaning (é as e+◌́ vs precomposed
  * é must dedup, fingerprint, and tokenize identically). Spark has no
  * built-in for this; a Scala UDF would serialize through String on
  * every row. SURVEY.md §4.3 case (b): scalar kernel as `Expression`
  * with `doGenCode`, stays inside WholeStageCodegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string arg, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Arity-checked SQL builder (the [[DotF32.builder]] contract). */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => NfcNormalize(c)
    case other =>
      throw Bridge.analysisError(
        s"nfc_normalize expects exactly 1 argument, got ${other.length}")
  }
}
