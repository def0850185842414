package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage scorer next to `levenshtein` in the fuzzy-join
  * family: match window ⌊max(|a|,|b|)/2⌋−1 (floored at 0), greedy
  * left-to-right matching, transpositions = half the out-of-order
  * matches, prefix boost `+0.1·min(4, prefix)·(1−jaro)` applied only
  * above the 0.7 threshold. Degenerate semantics follow the common
  * implementation (DuckDB's `jaro_winkler_similarity` replays this
  * operator in the oracle): ANY empty side scores 0 — including
  * empty-vs-empty — and m = 0 scores 0.
  *
  * Char-based (UTF-16 code units), equal to byte/codepoint variants on
  * ASCII text — the documents.text contract, same caveat as
  * [[PolyHash]]. O(|a|·window) time, O(|a|+|b|) scratch per row —
  * a scalar kernel (SURVEY.md §4.3 case (b)), no shuffle implications.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two string args, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scalar kernel; see class doc for the exact variant. */
  def sim(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && b.charAt(j) == a.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2.0) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }

  /** Column-level surface. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => JaroWinkler(a, b)
    case other => throw Bridge.analysisError(
      s"jaro_winkler expects 2 arguments, got ${other.length}")
  }

  /** Register `jaro_winkler(a, b)` for SQL reachability. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      builder(_)
    )
}
