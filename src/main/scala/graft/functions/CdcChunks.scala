package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel (the Rabin/FastCDC idea at token
  * granularity): split a document at TOKEN positions where the
  * w-token-gram polynomial hash satisfies `fp % modulus == 0`. Cut
  * points depend only on local CONTENT, not absolute offsets, so an
  * insertion near the head shifts every fixed-size chunk but leaves
  * all content-defined chunks outside the edited window identical —
  * the property chunk-level dedup needs and [[graft.ops.Text
  * .chunkDocs]]' fixed-size split cannot give.
  *
  * One pass over the document bytes: token boundaries, per-gram
  * [[PolyHash]] fold (each gram joined by single spaces IS a
  * contiguous byte range — the [[ShingleArray]] zero-copy argument),
  * chunk substrings sliced straight from the input. Expected chunk
  * length ≈ `modulus` tokens (geometric); a cut after the final token
  * is skipped (no empty trailing chunk); a doc with fewer than w
  * tokens is one chunk. Hash = base-31 mod 1e9+7 over the gram bytes,
  * bit-identical to `poly_hash(array_to_string(slice))` and
  * SQL-replicable — the oracle recomputes every cut in DuckDB.
  *
  * BYTE-based like the whole fingerprint family ([[PolyHash]],
  * [[WinnowFps]]): it equals the char-based `ascii()` SQL respelling
  * exactly on ASCII text — the `documents.text` contract (the driver's
  * schema gate asserts ASCII at every sf). On non-ASCII text the cuts
  * are still valid content-defined cuts (multi-byte sequences hash per
  * byte), but a code-point-based oracle would diverge.
  */
case class CdcChunks(child: Expression, w: Int, modulus: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(w >= 1, s"gram width must be >= 1, got $w")
  require(modulus >= 2, s"modulus must be >= 2, got $modulus")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string arg, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val Space = ' '.toByte
  private val Base = 31L
  private val Mod = 1000000007L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundaries — split(" ", -1) semantics, empty tokens included
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        starts += s; ends += i; s = i + 1
      }
      i += 1
    }
    val t = starts.length
    val ngrams = t - w + 1
    // chunk-start token indices: 0, then i+w for every cutting gram i
    val chunkStarts = new scala.collection.mutable.ArrayBuffer[Int](8)
    chunkStarts += 0
    var g = 0
    while (g < ngrams) {
      if (g + w < t) { // a cut after the last token would leave an empty chunk
        var acc = 0L
        var b = starts(g)
        val e = ends(g + w - 1)
        while (b < e) {
          acc = (acc * Base + (bytes(b) & 0xff)) % Mod
          b += 1
        }
        if (acc % modulus == 0) chunkStarts += g + w
      }
      g += 1
    }
    val out = new Array[Any](chunkStarts.length)
    var c = 0
    while (c < chunkStarts.length) {
      val from = starts(chunkStarts(c))
      val until = if (c + 1 < chunkStarts.length) ends(chunkStarts(c + 1) - 1) else ends(t - 1)
      out(c) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  /** Column-level surface: `cdcChunks(text, w, modulus)` — array of
    * chunk strings in document order. */
  def cdcChunks(text: Column, w: Int, modulus: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), w, modulus))

  /** Arity-checked SQL builder: `cdc_chunks(text, w, modulus)`. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t,
        org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _),
        org.apache.spark.sql.catalyst.expressions.Literal(m: Int, _)) =>
      CdcChunks(t, w, m)
    case other =>
      throw Bridge.analysisError(
        s"cdc_chunks expects (text, w, modulus) with integer literals, got ${other.length} args")
  }
}
