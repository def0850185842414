package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row benchmark-overlap counter: how many DISTINCT word k-shingles
  * of the document appear in a FIXED shingle set — the stateless form of
  * [[graft.ops.Decontaminate.overlapCountsAgainst]] for STREAMING
  * admission control, where the join-based form would need a streaming
  * aggregation (explode → semi-join → groupBy) and its watermark state.
  *
  * The set rides a Spark BROADCAST, not the serialized expression: a
  * benchmark suite's distinct shingles run to millions of strings, and
  * an expression-embedded Seq would be re-shipped and re-hashed per TASK
  * (measured 20× off the raw drain rate in CurateBench before the
  * switch). The broadcast value is deserialized once per EXECUTOR and
  * cached by the block manager; tasks pay one handle lookup. Bounded by
  * the same eval-suites-are-small assumption that makes the batch
  * broadcast join legal.
  *
  * Semantics match the join form bit-for-bit (ShingleSetOverlapSpec):
  * `split(text, ' ')` tokens (empty tokens included), spans compared
  * byte-exact, each matching shingle counted ONCE per document. Same
  * family as [[MinHashSig]]; CodegenFallback because per-row work (span
  * hashing + set probes) dominates row plumbing.
  */
case class ShingleSetOverlap(
    child: Expression,
    k: Int,
    bcastSet: Broadcast[java.util.HashSet[UTF8String]]
) extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set_overlap expects a string arg, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_set_overlap"

  @transient private lazy val set: java.util.HashSet[UTF8String] = bcastSet.value

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
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
    // count each matching shingle once: dedup only the MATCHES (small)
    val matched = new java.util.HashSet[UTF8String](8)
    var sh = 0
    while (sh <= nTok - k) {
      val sgl = UTF8String.fromBytes(bytes, starts(sh), ends(sh + k - 1) - starts(sh))
      if (set.contains(sgl)) matched.add(sgl)
      sh += 1
    }
    matched.size.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSetOverlap {

  /** Column-level surface: broadcasts the set once at plan build. */
  def shingleSetOverlap(text: Column, k: Int, shingles: Seq[String]): Column = {
    val set = new java.util.HashSet[UTF8String](shingles.length * 2)
    shingles.foreach(x => set.add(UTF8String.fromString(x)))
    val bcast = SparkSession.active.sparkContext.broadcast(set)
    Bridge.column(ShingleSetOverlap(Bridge.expression(text), k, bcast))
  }
}
