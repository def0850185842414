package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel: the whole
  * `split → k-shingle → md5 → (h1, h2) → per-seed min` pipeline
  * ([[graft.ops.DedupDocs.minhashSignatures]]) as ONE pass over a
  * document's UTF-8 bytes — no shingle-array materialization, no joined
  * shingle strings, no hex round-trip, no explode, no 32-column
  * min-aggregate.
  *
  * BIT-IDENTICAL to the SQL/HOF formulation the DuckDB oracle spells
  * (MinHashSigSpec asserts it on adversarial inputs):
  *  - tokens = single-space split INCLUDING empty tokens (consecutive /
  *    leading / trailing spaces), exactly like `split(text, ' ')` —
  *    0x20 never occurs inside a UTF-8 multi-byte sequence, so the byte
  *    scan equals the codepoint split;
  *  - shingle digest = MD5 of the bytes of `tok_i ⧺ ' ' ⧺ … ⧺ tok_{i+k-1}`
  *    (what `md5(cast(concat_ws(' ', slice(...)) AS binary))` hashes),
  *    fed to the digest without building the string;
  *  - `h1` = first 15 hex chars as a long = the digest's first 60 bits;
  *    `h2` = hex chars 17..31 = bits 64..123, mod 1e9+7 — double-hashing
  *    family `(h1 mod p + s·h2) mod p`, p = 1e9+7. The outer reduction
  *    is load-bearing: without it the unreduced 60-bit `h1` term dwarfs
  *    `s·h2` (≤ 1.5e10), the per-seed argmin collapses to the single
  *    min-h1 shingle, and the "16-hash" signature degenerates to one
  *    hash repeated — match counts only ever 0 or numHashes, no LSH
  *    S-curve (measured in r9: every candidate pair scored 0/16 or
  *    16/16 before the fix);
  *  - duplicate shingles need no `array_distinct`: they cannot change a
  *    minimum.
  *
  * Documents with fewer than k tokens yield NULL (they contribute no
  * shingles — callers filter, matching the groupBy-over-zero-rows
  * absence in the HOF form).
  *
  * CodegenFallback is deliberate: the per-ROW cost is hundreds of MD5
  * blocks (one per shingle), so the per-row boxing a fallback adds is
  * noise — a doGenCode would buy nothing (same family as [[DotF32]] /
  * [[PolyHash]] but agg-shaped work per row).
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"shingle size k=$k must be >= 1")
  require(numHashes >= 1 && numHashes <= 512, s"numHashes=$numHashes out of [1, 512]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val digestLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val Mod = 1000000007L
  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundaries: single-space split, empty tokens included
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
    if (t < k) return null

    val md = digestLocal.get()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var sh = 0
    while (sh <= t - k) {
      md.reset()
      // shingle bytes = tokens sh..sh+k-1 joined by a single space — for
      // k consecutive tokens of the SAME split that is exactly the
      // contiguous byte range (separators included), one update call
      md.update(bytes, starts(sh), ends(sh + k - 1) - starts(sh))
      val d = md.digest()
      var h1 = 0L
      var j = 0
      while (j < 7) { h1 = (h1 << 8) | (d(j) & 0xffL); j += 1 }
      h1 = (h1 << 4) | ((d(7) & 0xf0L) >>> 4)
      var h2 = 0L
      j = 8
      while (j < 15) { h2 = (h2 << 8) | (d(j) & 0xffL); j += 1 }
      h2 = ((h2 << 4) | ((d(15) & 0xf0L) >>> 4)) % Mod
      val h1m = h1 % Mod
      var seed = 0
      while (seed < numHashes) {
        val v = (h1m + seed.toLong * h2) % Mod
        if (v < mins(seed)) mins(seed) = v
        seed += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** Column-level surface. */
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), k, numHashes))

  /** Arity-checked SQL builder: `minhash_sig(text, k, numHashes)` with
    * foldable integer literals for k/numHashes. */
  def builder(children: Seq[Expression]): Expression = {
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other =>
        throw Bridge.analysisError(
          s"minhash_sig $what must be an integer literal, got ${other.sql}")
    }
    children match {
      case Seq(t, k, n) => MinHashSig(t, intLit(k, "k"), intLit(n, "numHashes"))
      case other =>
        throw Bridge.analysisError(
          s"minhash_sig expects 3 arguments (text, k, numHashes), got ${other.length}")
    }
  }
}
