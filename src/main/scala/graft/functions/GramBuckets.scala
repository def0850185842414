package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-gram feature-bucket kernel: every gram's md5 bucket id for a
  * document, as ONE pass over the UTF-8 bytes — the hot inner loop of
  * [[graft.ops.Dsir]] and [[graft.ops.QualityClassifier]] scoring.
  *
  * The bucket recipe is EXACTLY [[graft.ops.QualityClassifier.bucket]]
  * (what the generated DuckDB oracles spell): bucket = first 4 md5
  * digest bytes of `"salt:" || gram` as an unsigned 32-bit value, mod
  * `numBuckets`. The expression-tree form pays, per gram: a `slice`
  * array copy + a `concat_ws` string build (bigrams), a `concat` with
  * the salt, an md5 → 32-char HEX string, a `substring`, and a
  * base-16 `conv` parse. Here the salt prefix is one cached byte
  * array, each unigram is a zero-copy byte range of the input, and —
  * the [[MinHashSig]]/[[GramHashes]] observation — a space-joined
  * bigram of the single-space split IS a contiguous byte range too, so
  * every gram is two `MessageDigest.update` calls and an integer mod.
  * No gram string, no hex round-trip ever exists.
  *
  * Output order is the [[graft.ops.Dsir]] gram-stream contract: all
  * unigrams in token order, then (gramSize = 2) all adjacent bigrams in
  * order — so `explode` feeds the same per-doc multiset the HOF
  * formulation produces (order is irrelevant to the consuming
  * aggregates, but spec equality is exact, element for element:
  * GramBucketsSpec pins the kernel against the expression-tree form on
  * documents and adversarial strings).
  *
  * Tokenization: single-space split including empty tokens (`split(text,
  * ' ')` semantics — empty token ⇒ empty gram bytes, digest of just the
  * salt prefix, same as the HOF form's `md5('salt:')`). NULL text →
  * NULL. CodegenFallback for the [[MinHashSig]] reason: per-row work is
  * one MD5 block per gram; generated plumbing would buy nothing.
  */
case class GramBuckets(
    child: Expression,
    numBuckets: Int,
    salt: String,
    gramSize: Int
) extends UnaryExpression
    with CodegenFallback {

  require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
  require(gramSize == 1 || gramSize == 2, s"gramSize must be 1 or 2, got $gramSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_buckets expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_buckets"

  @transient private lazy val digestLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  @transient private lazy val saltBytes: Array[Byte] = s"$salt:".getBytes("UTF-8")

  private val Space = ' '.toByte

  private def bucketOf(
      md: java.security.MessageDigest,
      bytes: Array[Byte],
      start: Int,
      len: Int
  ): Long = {
    md.reset()
    md.update(saltBytes)
    md.update(bytes, start, len)
    val d = md.digest()
    // first 4 digest bytes, big-endian, as the unsigned 32-bit value the
    // HOF form parses from the first 8 hex chars; non-negative, so plain
    // % equals pmod
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % numBuckets
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // presize raw offset arrays from a space-count pass (the
    // GramHashes/MinHashSig layout) — an ArrayBuffer[Int] here would box
    // every offset in the kernel's hot loop
    var t = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == Space) t += 1; i += 1 }
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    var s = 0
    var w = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == Space) {
        starts(w) = s; ends(w) = i; w += 1; s = i + 1
      }
      i += 1
    }
    val nBi = if (gramSize == 2 && t >= 2) t - 1 else 0
    val md = digestLocal.get()
    val out = new Array[Long](t + nBi)
    var j = 0
    while (j < t) {
      out(j) = bucketOf(md, bytes, starts(j), ends(j) - starts(j))
      j += 1
    }
    var b = 0
    while (b < nBi) {
      out(t + b) = bucketOf(md, bytes, starts(b), ends(b + 1) - starts(b))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramBuckets {

  /** Column-level surface. */
  def gramBuckets(text: Column, numBuckets: Int, salt: String, gramSize: Int = 1): Column =
    Bridge.column(GramBuckets(Bridge.expression(text), numBuckets, salt, gramSize))
}
