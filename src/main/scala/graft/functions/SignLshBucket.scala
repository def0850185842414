package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the sign-LSH bucket key: for each of
  * `planes.length` constant hyperplanes, the sign bit of the
  * (left-to-right, double-precision) projection of a float embedding —
  * one fused loop over the array in generated code, with the plane
  * matrix attached as a codegen reference object. Replaces
  * `numPlanes` interpreted `aggregate(zip_with(...))` chains, each of
  * which materialized an intermediate array per row per plane.
  *
  * Semantics mirror the HOF formulation BIT-FOR-BIT, including its edge
  * cases: each plane's projection folds `0.0 + x(0)·c(0) + x(1)·c(1) +
  * …` in order (the sign decision at proj ≈ 0 depends on it); a NULL
  * input array, a NULL element, or an array whose length differs from
  * the plane dimension makes every projection NULL, and
  * `when(proj >= 0, bit).otherwise(0)` turns NULL into an unset bit —
  * so the result is 0, never NULL (this expression is non-nullable).
  * A NaN projection SETS the bit: SQL comparison semantics (Spark and
  * the DuckDB oracle alike) order NaN above every value, so the sign
  * test is `!(acc < 0)`, not Java's `acc >= 0`
  * (CodegenEquivalenceSpec pins this property).
  *
  * SURVEY.md §4.3 case (b), same family as [[DotF32]]/[[PolyHash]].
  */
case class SignLshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 31, s"1..31 planes, got ${planes.length}")
  require(planes.forall(_.length == planes.head.length), "ragged plane matrix")
  // Seq in the case class gives structural equality (plan canonicalization
  // / subexpression elimination compare expressions); the primitive
  // matrix below is what eval/codegen touch.
  @transient private lazy val matrix: Array[Array[Double]] = planes.map(_.toArray).toArray
  private def dim: Int = planes.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket expects array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sign_lsh_bucket"

  /** NULL input → bucket 0, exactly like the when/otherwise HOF chain. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return 0; i += 1 }
    var bucket = 0
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += arr.getFloat(j).toDouble * plane(j); j += 1 }
      // !(acc < 0), NOT acc >= 0: Spark SQL (and the DuckDB oracle) order
      // NaN above every value, so a NaN projection must SET the bit —
      // Java's primitive >= would leave it unset (CodegenEquivalenceSpec
      // pins this against the when(proj >= 0) HOF chain)
      if (!(acc < 0)) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", matrix, "double[][]")
    val arr = ctx.freshName("arr")
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val acc = ctx.freshName("acc")
    val bucket = ctx.freshName("bucket")
    val code =
      code"""
        |${childGen.code}
        |int $bucket = 0;
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        |  boolean $ok = $arr.numElements() == $dim;
        |  if ($ok) {
        |    for (int $i = 0; $i < $dim; $i++) {
        |      if ($arr.isNullAt($i)) { $ok = false; break; }
        |    }
        |  }
        |  if ($ok) {
        |    for (int $p = 0; $p < ${planes.length}; $p++) {
        |      double[] ${acc}_plane = $planesRef[$p];
        |      double $acc = 0.0;
        |      for (int $j = 0; $j < $dim; $j++) {
        |        $acc += ((double) $arr.getFloat($j)) * ${acc}_plane[$j];
        |      }
        |      if (!($acc < 0)) $bucket |= 1 << $p; // NaN sets the bit (SQL NaN ordering)
        |    }
        |  }
        |}
        |int ${ev.value} = $bucket;
        |""".stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBucket {

  /** Column-level surface. */
  def bucket(embedding: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(SignLshBucket(Bridge.expression(embedding), planes))
}
