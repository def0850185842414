package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional gram-digest kernel: all token k-gram MD5s of a document,
  * IN ORDER (one 16-byte digest per gram start), as one pass over the
  * UTF-8 bytes. This is [[MinHashSig]]'s zero-copy shingle scan without
  * the min-reduction — the consumer that needs gram IDENTITY per
  * position ([[graft.ops.DedupDocs.dupSpans]]) groups and joins on the
  * 16-byte digest instead of a built-up gram STRING, so no
  * slice/concat_ws allocation per position and a fixed-width exchange
  * key. MD5 is collision-free at corpus scale for this purpose — the
  * same standing assumption as the MinHash/exact-dedup pipelines.
  *
  * Tokenization and digest input are bit-identical to the SQL/HOF gram
  * formulation (`md5(cast(concat_ws(' ', slice(split(text, ' '), i+1, k))
  * AS binary))`): single-space split including empty tokens, and k
  * consecutive tokens of that split joined by ' ' are exactly a
  * contiguous byte range of the input — one digest update, no string.
  * GramHashesSpec pins the equivalence.
  *
  * Documents with fewer than k tokens yield NULL (no gram positions —
  * posexplode emits nothing, matching the HOF form's empty array).
  *
  * CodegenFallback for the same reason as [[MinHashSig]]: per-row work
  * is many MD5 blocks; generated row plumbing would buy nothing.
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, s"gram size k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_hashes"

  @transient private lazy val digestLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val Space = ' '.toByte

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
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
    val out = new Array[Any](t - k + 1)
    var sh = 0
    while (sh <= t - k) {
      md.reset()
      md.update(bytes, starts(sh), ends(sh + k - 1) - starts(sh))
      out(sh) = md.digest()
      sh += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {

  /** Column-level surface. */
  def gramHashes(text: Column, k: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(text), k))
}
