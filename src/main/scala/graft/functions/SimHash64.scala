package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash kernel: tokenize (single-space split, empty
  * tokens included — `split(text, ' ')` semantics), MD5 per token
  * occurrence, per-bit ±1 vote, sign → bit — one pass over the
  * document's UTF-8 bytes, replacing the token explode + 16-lane packed
  * popcount aggregate ([[graft.ops.DedupDocs.simhash]]'s previous plan).
  *
  * Token hash = the digest's first 8 bytes with the reference mapping:
  * bits 0..31 from hex chars 9..16 (bytes 4..7), bits 32..63 from hex
  * chars 1..8 (bytes 0..3). Bit b is set iff `2·c_b > n` (c_b = tokens
  * voting 1, n = token count) — the exact sign test the lane form used,
  * so hashes are bit-identical (SimHash64Spec). Int vote counters also
  * remove the lane form's 32 767-token-per-doc capacity bound.
  *
  * NULL text → NULL (callers filter, matching the vanished groupBy row
  * of the explode form). Same family as [[MinHashSig]]/[[ShingleArray]];
  * CodegenFallback because per-row work is one MD5 block per token.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string arg, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  @transient private lazy val digestLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = digestLocal.get()
    val counts = new Array[Int](64)
    var n = 0
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        md.reset()
        md.update(bytes, s, i - s)
        val d = md.digest()
        // th_hi = bytes 0..3 (hex 1..8) → bits 32..63; th_lo = bytes 4..7
        // (hex 9..16) → bits 0..31
        var hi = 0L
        var lo = 0L
        var j = 0
        while (j < 4) { hi = (hi << 8) | (d(j) & 0xffL); j += 1 }
        while (j < 8) { lo = (lo << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) counts(b) += 1
          if (((hi >>> b) & 1L) == 1L) counts(b + 32) += 1
          b += 1
        }
        n += 1
        s = i + 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2L * counts(b) > n) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Column-level surface. */
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  /** Arity-checked SQL builder: `simhash64(text)`. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(t) => SimHash64(t)
    case other =>
      throw Bridge.analysisError(
        s"simhash64 expects exactly 1 argument, got ${other.length}")
  }
}
