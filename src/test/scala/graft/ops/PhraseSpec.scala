package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Phrase]] — batch HOF form vs indexed postings form parity, overlap
  * semantics, k-term phrases. */
class PhraseSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val docs = Seq(
    (1L, "a a a b"),          // "a a": overlapping hits at 0 and 1
    (2L, "x a a y a a"),      // hits at 1 and 4
    (3L, "a b a b a"),        // "a b a": hits at 0 and 2 (3-term overlap)
    (4L, "no match here"),
    (5L, "a")                 // shorter than any 2-term phrase
  ).toDF("doc_id", "text")

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Int)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("phraseMatches counts OVERLAPPING token-level occurrences, 0-based first_pos") {
    val got = collect(Phrase.phraseMatches(docs, "a a"))
    assert(got == Map(1L -> ((2L, 0)), 2L -> ((2L, 1))))
  }

  test("3-term phrase with self-overlap") {
    val got = collect(Phrase.phraseMatches(docs, "a b a"))
    assert(got == Map(3L -> ((2L, 0))))
  }

  test("indexed form matches the batch form on every phrase") {
    val postings = Phrase.positionalPostings(docs)
    for (phrase <- Seq("a a", "a b a", "no match", "absent term")) {
      val batch = collect(Phrase.phraseMatches(docs, phrase))
      val indexed = collect(Phrase.phraseSearchIndexed(postings, phrase))
      assert(indexed == batch, s"phrase '$phrase'")
    }
  }

  test("single-term phrase degenerates to term lookup in both forms") {
    val batch = collect(Phrase.phraseMatches(docs, "b"))
    assert(batch == Map(1L -> ((1L, 3)), 3L -> ((2L, 1))))
    assert(collect(Phrase.phraseSearchIndexed(Phrase.positionalPostings(docs), "b")) == batch)
  }
}
