package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** [[ShingleSetOverlap]]'s large-benchmark sibling: counts the DISTINCT
  * word k-shingles of a document whose xxhash64 MIGHT be in a broadcast
  * Bloom filter — the streaming-admission form of
  * [[graft.ops.Decontaminate]]'s Bloom plan, for benchmark sets too
  * large to hold as an exact executor-side hash set (the bloom is
  * ~1.2 MB per million shingles at 1 % fpp; the exact set is ~60×
  * that).
  *
  * Direction of error is the safe one for decontamination: a Bloom has
  * NO false negatives, so no contaminated document ever slips through;
  * ε false-positive shingle hits can only INFLATE a count and drop an
  * ~fpp-sized sliver of clean docs at the overlap threshold.
  *
  * The filter bytes ride a Spark broadcast and deserialize once per
  * executor (lazy val); shingle spans are hashed ZERO-COPY from the
  * document bytes with the same seed-42 XXH64 Spark's `xxhash64(col)`
  * uses, so the probe agrees byte-for-byte with the batch path's
  * `BloomFilterAggregate(xxhash64(shingle))` build side. Distinctness
  * of HITS is tracked in a small per-row set, exactly like the exact
  * kernel. CodegenFallback: per-row span hashing dominates plumbing.
  */
case class ShingleBloomOverlap(
    child: Expression,
    k: Int,
    bcastBloom: Broadcast[Array[Byte]]
) extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_bloom_overlap expects a string arg, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_bloom_overlap"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bcastBloom.value))

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == Space) nTok += 1; i += 1 }
    if (nTok < k) return 0L
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == Space) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    // count each might-contained shingle once: dedup only the HITS
    val matched = new java.util.HashSet[Long](8)
    var sh = 0
    while (sh <= nTok - k) {
      val off = starts(sh)
      val len = ends(sh + k - 1) - off
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, 42L)
      if (bloom.mightContainLong(h)) matched.add(h)
      sh += 1
    }
    matched.size.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleBloomOverlap {

  /** Column-level surface over pre-serialized Bloom bytes (the
    * [[graft.ops.Decontaminate]] builder's output format, which is also
    * what `BloomFilterMightContain` consumes). */
  def shingleBloomOverlap(text: Column, k: Int, bloomBytes: Array[Byte]): Column = {
    val bcast = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(bloomBytes)
    Bridge.column(ShingleBloomOverlap(Bridge.expression(text), k, bcast))
  }
}
