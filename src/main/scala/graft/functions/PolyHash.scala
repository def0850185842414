package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial document
  * fingerprint: `acc = (acc * base + byte) % mod` over the UTF-8 bytes of
  * a string, left-to-right. One tight primitive loop in generated code —
  * the HOF formulation (`aggregate(transform(split(text, ''), ...))`)
  * materializes a per-CHARACTER array per row and runs the fold as an
  * interpreted lambda, the most expensive way to compute a byte scan
  * (HOF lambdas do not participate in whole-stage codegen; measured in
  * COVERAGE.md).
  *
  * Byte-based, so it equals the char-based `ascii()` HOF/SQL formulation
  * exactly on ASCII text — the `documents.text` contract (the driver's
  * schema gate asserts ASCII at every sf). With `base = 31`,
  * `mod = 1e9+7` the accumulator stays far under Long range
  * (mod * 31 + 255 ≈ 3.1e10).
  *
  * SURVEY.md §4.3 case (b), same pattern as [[DotF32]]: scalar kernel as
  * `Expression` with `doGenCode`, no new plan nodes.
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  require(base > 0 && mod > 1 && mod <= Long.MaxValue / (base + 256),
    s"poly_hash base=$base mod=$mod would overflow the Long accumulator")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string arg, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${base}L + (long) ($bytes[$i] & 0xFF)) % ${mod}L;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {

  /** The fingerprint defaults: base-31 polynomial mod 1e9+7. */
  val DefaultBase = 31L
  val DefaultMod = 1000000007L

  /** Column-level surface. */
  def polyHash(c: Column, base: Long = DefaultBase, mod: Long = DefaultMod): Column =
    Bridge.column(PolyHash(Bridge.expression(c), base, mod))

  /** Arity-checked SQL builder shared by [[register]] and
    * [[graft.GraftExtensions]]: `poly_hash(str[, base[, mod]])`, where
    * base/mod must be foldable integer literals. Anything else fails
    * analysis with a named error — extra args must never be silently
    * discarded (a `poly_hash(text, 37)` that computed the base-31 hash
    * would be a wrong answer, not a convenience). */
  def builder(children: Seq[Expression]): Expression = {
    def longLit(e: Expression, what: String): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other =>
        throw Bridge.analysisError(
          s"poly_hash $what must be an integer literal, got ${other.sql}")
    }
    children match {
      case Seq(s) => PolyHash(s, DefaultBase, DefaultMod)
      case Seq(s, b) => PolyHash(s, longLit(b, "base"), DefaultMod)
      case Seq(s, b, m) => PolyHash(s, longLit(b, "base"), longLit(m, "mod"))
      case other =>
        throw Bridge.analysisError(
          s"poly_hash expects 1 to 3 arguments (str[, base[, mod]]), got ${other.length}")
    }
  }

  /** Register `poly_hash(str[, base[, mod]])` in a session's function
    * registry so `expr` / SQL can reach it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      builder(_)
    )
}
