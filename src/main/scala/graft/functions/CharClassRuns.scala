package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-pre-tokenizer run counter: `[n_alpha, n_num, n_punct]` —
  * the number of maximal runs of ASCII letters, of digits, and of
  * anything else that is not whitespace — in ONE pass over the UTF-8
  * bytes, replacing three full `regexp_extract_all(...)` scans that each
  * materialized a per-row array of match strings just to `size()` it
  * ([[graft.ops.Text.regexTokenStats]]).
  *
  * Byte-level is exact for these classes: letters/digits/whitespace
  * (" \t\n\r\x0B\f" — [[graft.ops.Text.WhitespaceClass]], the explicit class the SQL oracle uses — RE2 `\s`
  * differs) are single ASCII bytes, and every non-ASCII byte
  * (lead or continuation, ≥ 0x80) belongs to the punct class, so a run
  * of non-ASCII CHARS is byte-contiguous and counts as ONE punct run,
  * exactly like the char-level regex. Codegen'd — a tight byte loop,
  * same family as [[PolyHash]].
  */
case class CharClassRuns(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_class_runs expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_runs"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var alpha = 0L; var num = 0L; var punct = 0L
    var cls = 0 // 0 = whitespace/none, 1 = alpha, 2 = num, 3 = punct
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c =
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
        else if (b >= '0' && b <= '9') 2
        else if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == '\f') 0
        else 3
      if (c != cls) {
        if (c == 1) alpha += 1 else if (c == 2) num += 1 else if (c == 3) punct += 1
        cls = c
      }
      i += 1
    }
    new GenericArrayData(Array[Any](alpha, num, punct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val cls = ctx.freshName("cls")
      val alpha = ctx.freshName("alpha")
      val num = ctx.freshName("num")
      val punct = ctx.freshName("punct")
      s"""
         |byte[] $bytes = $in.getBytes();
         |long $alpha = 0L; long $num = 0L; long $punct = 0L;
         |int $cls = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  int $b = $bytes[$i] & 0xFF;
         |  int $c;
         |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) $c = 1;
         |  else if ($b >= '0' && $b <= '9') $c = 2;
         |  else if ($b == ' ' || $b == '\\t' || $b == '\\n' || $b == '\\r' || $b == 0x0B || $b == '\\f') $c = 0;
         |  else $c = 3;
         |  if ($c != $cls) {
         |    if ($c == 1) $alpha++; else if ($c == 2) $num++; else if ($c == 3) $punct++;
         |    $cls = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new Object[] { $alpha, $num, $punct });
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharClassRuns {

  /** Column-level surface. */
  def charClassRuns(text: Column): Column =
    Bridge.column(CharClassRuns(Bridge.expression(text)))

  /** Arity-checked SQL builder: `char_class_runs(text)`. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t) => CharClassRuns(t)
    case other =>
      throw Bridge.analysisError(
        s"char_class_runs expects exactly 1 argument, got ${other.length}")
  }
}
