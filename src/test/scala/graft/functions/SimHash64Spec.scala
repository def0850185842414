package graft.functions

import graft.SparkSpec
import graft.ops.DedupDocs

/** [[SimHash64]] (one-pass native kernel) against the packed-lane
  * aggregate formulation — bit-identical hashes on prose, space runs,
  * unicode, empty text, and random token streams. */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = canon(DedupDocs.simhash(df))
    val hof = canon(DedupDocs.simhashHof(df))
    assert(native == hof, s"texts=${texts.map(_.take(30))}")
  }

  test("prose, space runs, unicode, single and empty tokens") {
    compare(Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  b   c", // empty tokens vote too (split semantics)
      " leading trailing ",
      "", // one empty token
      "repeated repeated repeated word word",
      "数据 处理 引擎",
      "x"
    ))
  }

  test("property: random token streams agree bit-for-bit") {
    val rnd = new scala.util.Random(2718)
    val texts = (1 to 80).map { _ =>
      (0 until rnd.nextInt(40)).map { _ =>
        if (rnd.nextInt(7) == 0) ""
        else rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      }.mkString(" ")
    }
    compare(texts)
  }

  test("near-duplicates stay within small Hamming distance (sanity)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota KAPPA")
    ).toDF("doc_id", "text")
    val h = DedupDocs.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) <= 16)
  }
}
