package graft.functions

import graft.SparkSpec
import graft.ops.Text

/** [[TokenSetCounts]] against the interpreted `filter(toks, isin)` HOF
  * chains it replaced in qualityScores/langId — identical counts, ratios,
  * and language picks on duplicates, empty tokens, unicode markers, and
  * random token streams. */
class TokenSetCountsSpec extends SparkSpec {
  import spark.implicits._

  private val markers = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "das"),
    "zh" -> Seq("数据", "引擎")
  )

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def canon(out: org.apache.spark.sql.DataFrame) =
    out.orderBy("doc_id").collect().map(_.toSeq).toList

  private def compare(texts: Seq[String]): Unit = {
    val df = docs(texts)
    assert(canon(Text.qualityScores(df)) == canon(Text.qualityScoresHof(df)), "qualityScores")
    assert(canon(Text.langId(df, markers)) == canon(Text.langIdHof(df, markers)), "langId")
  }

  test("stopword duplicates, empty tokens, ties, unicode markers") {
    compare(Seq(
      "the quick the lazy the end", // duplicate stopwords all count
      "a  the   a", // empty tokens between space runs
      "der und das the and of", // 3-3 tie → first alphabetical lang
      "数据 处理 引擎",
      "nothing matches here",
      "the", // single token
      "" // one empty token
    ))
  }

  test("property: random streams over marker + noise vocab agree") {
    val rnd = new scala.util.Random(7717)
    val vocab = markers.values.flatten.toVector ++ Vector("x", "yz", "", "什么", "q1")
    val texts = (1 to 80).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    compare(texts)
  }
}
