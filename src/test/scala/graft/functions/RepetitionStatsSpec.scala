package graft.functions

import graft.SparkSpec
import graft.ops.Text

/** [[RepetitionStats]] against the distributed explode/groupBy
  * formulation it replaced — identical totals, top-gram counts, and
  * duplicated-occurrence counts on repeated tokens, empty tokens from
  * space runs, unicode, and random repetitive streams. */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def canon(out: org.apache.spark.sql.DataFrame) =
    out.orderBy("doc_id").collect().map(_.toSeq).toList

  private def compare(texts: Seq[String]): Unit =
    assert(canon(Text.repetition(docs(texts))) == canon(Text.repetitionExploded(docs(texts))))

  test("directed: known fractions") {
    // "a b a b a": 5 tokens (a×3, b×2 — all duplicated), bigrams
    // "a b"×2 "b a"×2 (top 2/4, dup 4/4), trigrams "a b a"×2 "b a b"
    // (top 2/3, dup 2/3)
    val r = Text.repetition(docs(Seq("a b a b a"))).collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 1.0) // dup_token_frac
    assert(r.getDouble(3) == 0.5) // top_2gram_frac
    assert(r.getDouble(4) == 1.0) // dup_2gram_frac
    assert(r.getDouble(5) == 0.6667) // top_3gram_frac
    assert(r.getDouble(6) == 0.6667) // dup_3gram_frac
  }

  test("directed: all-unique text has zero repetition") {
    val r = Text.repetition(docs(Seq("q w e r t y"))).collect()(0)
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(6) == 0.0)
    assert(r.getDouble(3) == 0.2) // top bigram count 1 of 5
    assert(r.getDouble(5) == 0.25) // top trigram count 1 of 4
  }

  test("edges: empty text, single token, short docs, space runs, unicode") {
    compare(Seq(
      "", // one empty token; no 2-/3-grams
      "solo",
      "a b", // one bigram, no trigram
      "a  b   a  b", // empty tokens between space runs repeat as grams
      "数据 引擎 数据 引擎 数据",
      "x x x x x x x x" // one gram value dominates everything
    ))
  }

  test("property: random repetitive streams agree with the exploded form") {
    val rnd = new scala.util.Random(40193)
    val vocab = Vector("a", "b", "ab", "", "xyz", "数据")
    val texts = (1 to 120).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    compare(texts)
  }
}
