package graft.functions

import graft.SparkSpec
import graft.ops.Text

/** [[CharClassRuns]] against the three-regex formulation — identical run
  * counts on ASCII prose, digit/punct mixes, whitespace variants
  * (incl. \x0B, which Java `\s` has but the explicit class must match
  * byte-for-byte), unicode, and random byte soup. */
class CharClassRunsSpec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toList
    val native = canon(Text.regexTokenStats(df))
    val hof = canon(Text.regexTokenStatsHof(df))
    assert(native == hof, s"texts=${texts.map(_.take(40))}")
  }

  test("prose, digits, punctuation, whitespace variants") {
    compare(Seq(
      "hello world 42 times!",
      "a1b2c3",
      "...---...",
      "tabs\tand\nnewlines\randvertical\ftabs",
      "",
      "    ",
      "ALLCAPS lower 0123456789 #$%",
      "trailing punct!!!",
      "!leading punct"
    ))
  }

  test("unicode chars count as punct runs, byte-contiguously") {
    compare(Seq(
      "héllo wörld", // é/ö split alpha runs with punct runs
      "数据 引擎", // pure multi-byte → one punct run per word
      "mixed 数据 ascii 123",
      "emoji 🙂 between words"
    ))
  }

  test("property: random ASCII+unicode soup agrees") {
    val rnd = new scala.util.Random(1009)
    val alphabet = "abzAZ019 .,!\t\n\fé数🙂"
    val texts = (1 to 100).map { _ =>
      (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    compare(texts)
  }
}
