package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation kernel: applies a trained merge list
  * ([[graft.ops.Bpe.train]]) to every space-separated word of a document
  * and emits the flat sub-word token stream, single-space joined.
  *
  * Apply SEMANTICS (the operator contract, pinned so the generated SQL
  * oracle is bit-equivalent): merges are applied **sequentially in rank
  * order**, each one replacing ALL of its non-overlapping left-to-right
  * adjacent-symbol occurrences before the next rank runs — the same walk
  * the trainer performs on its word dictionary, so in-vocab words
  * reproduce their training segmentation exactly. This differs from the
  * greedy min-rank re-scan apply (GPT-2 style) only in the corner where a
  * LATER merge manufactures a symbol that re-enables an EARLIER pair
  * (two merge paths producing the same symbol string); rank-sequential is
  * what a chain of `replace()` calls can spell in SQL, which keeps the
  * whole operator inside the hard oracle signal.
  *
  * A word is segmented at most once per task: segmentations are memoized
  * in a per-task hash map (Zipf reuse makes the hit rate ~1 at corpus
  * scale), capped at [[BpeEncode.CacheCap]] entries so an adversarial
  * all-distinct-words corpus degrades to recompute, not to OOM.
  *
  * Per-row cost without a hit is O(merges × word length) — the simple
  * exact walk, not the indexed trainer structure; the memo cache is what
  * makes it irrelevant. CodegenFallback like the other string kernels
  * ([[ShingleArray]]): per-row work dwarfs the boxing.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string arg, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  // merge list in apply form, materialized once per task after deser
  @transient private lazy val ma: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mb: Array[String] = merges.map(_._2).toArray
  @transient private lazy val cache =
    new java.util.HashMap[String, String](1 << 12)

  /** One word → its space-joined BPE tokens. */
  private def segment(word: String): String = {
    val hit = cache.get(word)
    if (hit != null) return hit
    // code-point symbols (not UTF-16 chars): a surrogate pair is ONE
    // initial symbol, matching the oracle's per-character regex unit
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    var r = 0
    while (r < ma.length && n > 1) {
      val a = ma(r)
      val b = mb(r)
      // non-overlapping left-to-right replace-all of (a,b) → a+b
      val next = new Array[String](n)
      var w = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
          next(w) = a + b; w += 1; j += 2
        } else {
          next(w) = syms(j); w += 1; j += 1
        }
      }
      syms = next
      n = w
      r += 1
    }
    val sb = new java.lang.StringBuilder(word.length * 2)
    var t = 0
    while (t < n) {
      if (t > 0) sb.append(' ')
      sb.append(syms(t))
      t += 1
    }
    val out = sb.toString
    if (cache.size < BpeEncode.CacheCap) cache.put(word, out)
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(text.length * 2)
    var start = 0
    var first = true
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (!first) sb.append(' ')
        first = false
        // an empty word (space run / empty text) segments to the empty
        // string — the oracle's regexp unitizer does the same
        if (i > start) sb.append(segment(text.substring(start, i)))
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Per-task memo entries; beyond this, distinct words recompute. */
  val CacheCap = 1 << 20

  /** Column-level surface. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges))
}
