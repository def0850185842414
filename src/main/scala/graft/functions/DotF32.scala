package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-embedding dot product — the
  * innermost kernel of every similarity operator (cosine top-k, near-dup,
  * IVF). A tight primitive loop over the two `ArrayData` buffers in
  * generated code, instead of the higher-order-function chain
  * (`aggregate(zip_with(...))`) which allocates an intermediate array per
  * row. Accumulation is left-to-right in double — bit-identical to the
  * HOF formulation, so oracle results don't move.
  *
  * SURVEY.md §4.3 case (b): scalar kernel as `Expression` with
  * `doGenCode`, no new plan nodes needed.
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects two array<float> args, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  /** A null ELEMENT nulls the result — exactly what the HOF chain
    * (`aggregate(zip_with(...))`) produces, keeping the documented
    * bit-identity honest (getFloat on a null slot would silently read 0). */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // the isNullAt probe only exists when element nulls are possible —
      // non-null arrays keep the tight branch-free loop (and when this
      // expression is non-nullable, ev.isNull is a literal that cannot
      // be assigned)
      val nullProbe =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullProbe
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotF32 {

  /** Column-level surface. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotF32(Bridge.expression(a), Bridge.expression(b)))

  /** Arity-checked SQL builder shared by [[register]] and
    * [[graft.GraftExtensions]]: exactly two array args (a one-arg call
    * must fail analysis, not throw IndexOutOfBounds; a three-arg call
    * must not silently drop the extra). */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => DotF32(a, b)
    case other =>
      throw Bridge.analysisError(
        s"dot_f32 expects exactly 2 arguments, got ${other.length}")
  }

  /** Register `dot_f32` in a session's function registry so `expr` / SQL
    * can reach it (the [[graft.GraftExtensions]] route does the same via
    * SparkSessionExtensions at session build time). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      builder(_)
    )
}
