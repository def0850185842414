package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of the UTF-8 text bytes (zlib level 6, raw
  * stream) — the denominator of the compression-ratio quality signal:
  * templated/boilerplate text compresses far better than natural prose,
  * so a low ratio flags machine-generated or repeated content (the
  * C4/Gopher-adjacent heuristic modern curation pipelines keep).
  *
  * Deterministic for a fixed input on a given JVM (one-shot deflate,
  * fixed level, no header) — the value is NOT SQL-replicable (DuckDB
  * has no deflate), so the query surface uses the driver's rows-only
  * check and the semantics are spec-pinned (monotonicity on
  * repetitive vs random text, empty input, UTF-8 multibyte). One
  * [[java.util.zip.Deflater]] per expression instance, reset between
  * rows — no per-row allocation.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects a string arg, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  @transient private lazy val deflater =
    new java.util.zip.Deflater(6, /* nowrap = */ true)
  @transient private lazy val buf = new Array[Byte](64 * 1024)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var total = 0
    while (!deflater.finished()) {
      total += deflater.deflate(buf)
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {

  /** Column-level surface. */
  def deflateSize(text: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(text)))
}
