package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Positional gram-identity kernel: a 128-bit identity per token k-gram
  * of a document, in order, as TWO independently-seeded xxHash64s over
  * the gram's contiguous byte range packed into one 16-byte key —
  * [[GramHashes]] with the MD5 swapped out. The identity width, output
  * shape (array<binary>, 16 B elements) and downstream plan are
  * IDENTICAL to the MD5 form — post-compression exchange bytes are too,
  * since a 128-bit identity carries 128 bits of entropy either way
  * (measured, DupSpansBench) — the whole win is kernel CPU:
  * `MessageDigest`'s per-call overhead (reset/pad/alloc per gram), not
  * the MD5 block math, dominated the digest cost at tens of millions of
  * short grams.
  *
  * Identity standing assumption — same as the MD5 pipelines': 128 bits
  * is collision-free at corpus scale (expected collisions n²/2¹²⁹; at
  * 10¹² grams that is ~10⁻¹⁴). The two seeds make an engineered state
  * collision survive only if it holds for BOTH initial accumulator
  * sets; no all-seed XXH64 collision pair is publicly known, whereas
  * MD5 collisions are published — this key is not the weaker one. No
  * SQL oracle ever spells these hashes: the dup-span oracles are
  * written over gram STRINGS, so gram identity is engine-internal
  * (LmRedactDupSpansSpec pins result equality against the retained MD5
  * form [[graft.ops.DedupDocs.dupSpansMd5]]).
  *
  * Tokenization is bit-identical to [[GramHashes]]: single-space split
  * including empty tokens; gram bytes are the contiguous range from the
  * first token's start to the k-th token's end. Documents with fewer
  * than k tokens yield NULL.
  *
  * CodegenFallback like the other digest kernels: the per-row byte scan
  * dominates; generated row plumbing buys nothing.
  */
case class GramXxPair(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"gram size k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_xx_pair expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_xx_pair"

  private val Space = ' '.toByte
  private val Seed1 = 0x67726166743131L // engine-internal, fixed
  private val Seed2 = 0x67726166743232L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundary scan with raw int arrays (no boxing in the kernel)
    var cap = 64
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var t = 0
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        if (t == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(t) = s; ends(t) = i; t += 1; s = i + 1
      }
      i += 1
    }
    if (t < k) return null

    val out = new Array[Any](t - k + 1)
    var sh = 0
    while (sh <= t - k) {
      val off = Platform.BYTE_ARRAY_OFFSET + starts(sh)
      val len = ends(sh + k - 1) - starts(sh)
      val key = new Array[Byte](16)
      Platform.putLong(key, Platform.BYTE_ARRAY_OFFSET,
        XXH64.hashUnsafeBytes(bytes, off, len, Seed1))
      Platform.putLong(key, Platform.BYTE_ARRAY_OFFSET + 8,
        XXH64.hashUnsafeBytes(bytes, off, len, Seed2))
      out(sh) = key
      sh += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramXxPair {

  /** Column-level surface. */
  def gramXxPair(text: Column, k: Int): Column =
    Bridge.column(GramXxPair(Bridge.expression(text), k))
}
