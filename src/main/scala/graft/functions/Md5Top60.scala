package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repo's deterministic 60-bit item
  * hash: the top 60 bits (first 15 hex digits) of the MD5 digest of a
  * string's UTF-8 bytes, as a non-negative BIGINT.
  *
  * Bit-identical to the SQL composition the oracle replays —
  * `conv(substring(md5(x), 1, 15), 16, 10)` (DuckDB:
  * `from_hex`-free `CAST(... FROM_HEX)` respellings or the same
  * conv/substr chain) — but WITHOUT materializing the 32-char hex
  * string, taking a substring, and parsing it back through a base-16
  * string decode, and with a thread-local reused `MessageDigest`
  * instead of a fresh `DigestUtils` allocation per row. Measured on
  * the q_profile battery (6 columns × 600k rows, ProfileCostSplit):
  * the conv/substring/md5 chain costs ~3.6 s of the query's 5.3 s;
  * this kernel removes the string legs of that.
  *
  * SURVEY.md §4.3 case (b), same pattern as [[PolyHash]]: scalar
  * kernel as `Expression` with `doGenCode`, no new plan nodes.
  */
case class Md5Top60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_top60 expects a string or binary arg, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_top60"

  private def isString = child.dataType.isInstanceOf[StringType]

  override protected def nullSafeEval(input: Any): Any = {
    val bytes =
      if (isString) input.asInstanceOf[UTF8String].getBytes
      else input.asInstanceOf[Array[Byte]]
    Md5Top60.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.functions.Md5Top60.hash($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Top60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): digest bytes 0..6 in full plus the high
    * nibble of byte 7 — exactly the value of the first 15 hex digits of
    * the hex rendering, so `conv(substring(md5(x),1,15),16,10)` equals
    * this bit for bit. Always non-negative (< 2^60). */
  def hash(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val out = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    (v << 4) | ((out(7) & 0xf0L) >>> 4)
  }

  /** Column-level surface. */
  def md5Top60(c: Column): Column = Bridge.column(Md5Top60(Bridge.expression(c)))

  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => Md5Top60(c)
    case other => throw Bridge.analysisError(
      s"md5_top60 expects 1 argument, got ${other.length}")
  }

  /** Register `md5_top60(str)` for SQL reachability. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("md5_top60"),
      new ExpressionInfo(classOf[Md5Top60].getName, "md5_top60"),
      builder(_)
    )
}
