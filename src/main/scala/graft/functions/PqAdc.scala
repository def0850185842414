package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Asymmetric-distance computation (ADC) for product-quantized search:
  * given a corpus vector's `m`-byte PQ code and a query's flattened
  * per-subspace lookup table (`m·ksub` doubles, `lut[s·ksub + c]` =
  * partial squared L2 between the query's subvector `s` and codeword
  * `c`), the approximate squared distance is `m` table lookups — the
  * query's float arithmetic against every codeword is paid ONCE per
  * query when the LUT is built, not per corpus row.
  *
  * This is the serving-scan inner kernel of [[graft.ops.Pq.adcTopK]]:
  * row volume is |queries| × |codes|, per-row work is tiny, so the row
  * plumbing dominates — codegen'd like [[DotF32]], not CodegenFallback
  * like the digest kernels. `ksub` is derived as
  * `lut.numElements / codes.length`; a LUT whose length is not a
  * positive multiple of the code length, or a code byte ≥ ksub, yields
  * NULL (never a misread slot).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (binary codes, array<double> lut), got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  private def lutElemsNullable: Boolean = right.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.length
    if (m == 0 || lut.numElements() % m != 0) return null
    val ksub = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes(s) & 0xff
      if (c >= ksub) return null
      val idx = s * ksub + c
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val nullProbe =
        if (lutElemsNullable) s"if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $m = $a.length;
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ksub = $b.numElements() / $m;
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $c = $a[$s] & 0xff;
         |    if ($c >= $ksub) { ${ev.isNull} = true; break; }
         |    int $idx = $s * $ksub + $c;
         |    $nullProbe
         |    $acc += $b.getDouble($idx);
         |  }
         |  ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Column-level surface. */
  def pqAdc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))
}
