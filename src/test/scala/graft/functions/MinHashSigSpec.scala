package graft.functions

import graft.SparkSpec
import graft.ops.DedupDocs
import org.apache.spark.sql.functions._

/** [[MinHashSig]] (one-pass native kernel) against the HOF/SQL
  * formulation it replaced — bit-for-bit on every (doc, seed) min,
  * including multi-space runs, leading/trailing spaces (empty tokens),
  * unicode, exact-k and under-k token counts. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val n = 8

  private def compare(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> (1 to n).map(r.getLong(_)).toList)
      .toMap
    val native = canon(nativeWide(df))
    val hof = canon(DedupDocs.wideSignaturesHof(df, k, n))
    assert(native == hof, s"texts=${texts.map(_.take(30))}")
  }

  private def nativeWide(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), MinHashSig.minhashSig(col("text"), k, n).as("ms"))
    .where(col("ms").isNotNull)
    .select(col("doc_id") +: (0 until n).map(s => col("ms").getItem(s).as(s"m$s")): _*)

  test("matches the HOF pipeline on plain prose") {
    compare(Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g",
      "one two three" // exactly k tokens → one shingle
    ))
  }

  test("empty tokens from space runs are tokens, as in split(text, ' ')") {
    compare(Seq(
      "a  b   c d", // consecutive spaces → empty tokens inside shingles
      " leading and trailing ",
      "   ", // 4 empty tokens → shingles of empties
      "x y  "
    ))
  }

  test("documents with fewer than k tokens drop out of both pipelines") {
    val df = Seq((1L, "only two"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(nativeWide(df).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(DedupDocs.wideSignaturesHof(df, k, n).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("unicode text hashes identically (byte-level space split is exact)") {
    compare(Seq(
      "héllo wörld żółw éléphant über",
      "数据 处理 引擎 规模 测试",
      "mixé ascii 和 unicode tokens here"
    ))
  }

  test("property: random texts agree bit-for-bit") {
    val rnd = new scala.util.Random(31337)
    val texts = (1 to 60).map { _ =>
      val nTok = rnd.nextInt(30)
      (0 until nTok).map { _ =>
        if (rnd.nextInt(8) == 0) "" // empty token (double space)
        else rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString
      }.mkString(" ")
    }
    compare(texts)
  }

  test("duplicate shingles cannot change the minimum") {
    compare(Seq("a b a b a b a b", "x x x x x x"))
  }
}
