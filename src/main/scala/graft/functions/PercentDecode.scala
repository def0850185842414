package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass decoder for the RFC 3986 UNRESERVED
  * percent-escapes (`%41`→`A` … `%7E`→`~`, both hex cases; reserved
  * escapes like `%2F` keep their bytes) — one left-to-right scan over
  * the UTF-8 bytes, replacing the 66-pattern `regexp_replace` chain
  * that made URL canonicalization the 100× sweep's worst regression
  * (q_url_dedup 90 s; the chain recompiled 66 regexes per projection
  * AND cascaded: `%7%41` folded to `z` because the `%41`→`A` pass
  * manufactured a brand-new `%7A` escape for a later pass to eat —
  * a double-decode bug, not just a slowdown. A single pass decodes
  * each source escape exactly once: `%7%41` → `%7A`.)
  *
  * Byte-level is exact: escapes are pure-ASCII triples and every
  * decoded char is ASCII, so multi-byte UTF-8 sequences pass through
  * untouched and the output is valid UTF-8 whenever the input is.
  * Codegen'd tight loop, same family as [[CharClassRuns]]; the HOF
  * split-on-'%' twin is retained as the equivalence oracle
  * ([[graft.ops.Urls.percentDecodeUnreservedHof]], UrlsSpec).
  */
case class PercentDecodeUnreserved(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"percent_decode_unreserved expects a string arg, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "percent_decode_unreserved"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    var o = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var decoded = -1
      if (b == '%' && i + 2 < bytes.length) {
        val h1 = PercentDecodeUnreserved.hexVal(bytes(i + 1))
        val h2 = PercentDecodeUnreserved.hexVal(bytes(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = h1 * 16 + h2
          if (PercentDecodeUnreserved.isUnreserved(v)) decoded = v
        }
      }
      if (decoded >= 0) { out(o) = decoded.toByte; o += 1; i += 3 }
      else { out(o) = bytes(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val o = ctx.freshName("o")
      val b = ctx.freshName("b")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      val dec = ctx.freshName("dec")
      val cls = classOf[PercentDecodeUnreserved].getName
      s"""
         |byte[] $bytes = $in.getBytes();
         |byte[] $out = new byte[$bytes.length];
         |int $o = 0;
         |for (int $i = 0; $i < $bytes.length; ) {
         |  int $b = $bytes[$i] & 0xFF;
         |  int $dec = -1;
         |  if ($b == '%' && $i + 2 < $bytes.length) {
         |    int $h1 = $cls.hexVal($bytes[$i + 1]);
         |    int $h2 = $cls.hexVal($bytes[$i + 2]);
         |    if ($h1 >= 0 && $h2 >= 0) {
         |      int $v = $h1 * 16 + $h2;
         |      if ($cls.isUnreserved($v)) $dec = $v;
         |    }
         |  }
         |  if ($dec >= 0) { $out[$o++] = (byte) $dec; $i += 3; }
         |  else { $out[$o++] = $bytes[$i]; $i += 1; }
         |}
         |${ev.value} = UTF8String.fromBytes($out, 0, $o);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PercentDecodeUnreserved {

  /** Hex digit value, or -1 (static — called from generated code). */
  def hexVal(b: Byte): Int = {
    val c = b & 0xff
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1
  }

  /** RFC 3986 unreserved: ALPHA / DIGIT / - . _ ~ (static — called
    * from generated code). */
  def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** Column-level surface. */
  def percentDecodeUnreserved(url: Column): Column =
    Bridge.column(PercentDecodeUnreserved(Bridge.expression(url)))

  /** Arity-checked SQL builder: `percent_decode_unreserved(url)`. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(u) => PercentDecodeUnreserved(u)
    case other =>
      throw Bridge.analysisError(
        s"percent_decode_unreserved expects exactly 1 argument, got ${other.length}")
  }
}
