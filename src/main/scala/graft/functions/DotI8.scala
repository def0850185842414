package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Integer dot product over two `array<tinyint>` quantized vectors —
  * the scoring kernel of the SQ8 serving path ([[graft.ops.Sq]]). All
  * arithmetic is exact 64-bit integer (byte·byte products summed into a
  * long can never overflow below ~2⁴⁸ dims), so unlike the float kernel
  * the result is engine-independent without rounding conventions.
  * Same shape as [[DotF32]]: tight primitive loop in generated code,
  * SURVEY.md §4.3 case (b).
  */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 expects two array<tinyint> args, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  /** Null element ⇒ null result (mirrors [[DotF32]]'s HOF-equivalent
    * contract; silently reading a null slot as 0 would skew scores). */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullProbe =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullProbe
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotI8 {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotI8(Bridge.expression(a), Bridge.expression(b)))

  /** Arity-checked SQL builder (the [[DotF32.builder]] contract). */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => DotI8(a, b)
    case other =>
      throw Bridge.analysisError(
        s"dot_i8 expects exactly 2 arguments, got ${other.length}")
  }
}
