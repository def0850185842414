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

  test("native kernel == interpreted HOF chain on adversarial tokenization (r19 A/B)") {
    // the r18 HOF spelling, verbatim — the reference the kernel replaced
    def hofMatches(df: org.apache.spark.sql.DataFrame, phrase: String) = {
      val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
      val k = terms.length
      val toks = split(col("text"), " ")
      val starts = when(size(toks) >= k, sequence(lit(0), size(toks) - k))
        .otherwise(lit(Array.empty[Int]))
      val hits = filter(starts, (i: org.apache.spark.sql.Column) =>
        terms.zipWithIndex
          .map { case (t, j) => element_at(toks, i + j + 1) === lit(t) }
          .reduce(_ && _))
      df.select(
        col("doc_id"),
        size(hits).cast("long").as("n_hits"),
        when(size(hits) > 0, element_at(hits, 1)).as("first_pos"))
        .where(col("n_hits") > 0)
    }
    val adversarial = Seq(
      (10L, "a a a b"),
      (11L, " a a"),            // leading space → leading empty token shifts positions
      (12L, "a a "),            // trailing space → trailing empty token kept
      (13L, "a  a a"),          // double space → empty token breaks adjacency
      (14L, ""),                // empty text = one empty token
      (15L, "ü ü ß"),           // multi-byte UTF-8 tokens
      (16L, null.asInstanceOf[String]), // null text dropped by both forms
      (17L, "a a a a a")        // max overlap
    ).toDF("doc_id", "text")
    for (phrase <- Seq("a a", "a a a", "ü ü", "ß", "b")) {
      val kern = collect(Phrase.phraseMatches(adversarial, phrase))
      val hof = collect(hofMatches(adversarial, phrase))
      assert(kern == hof, s"phrase '$phrase'")
    }
  }

  test("single-term phrase degenerates to term lookup in both forms") {
    val batch = collect(Phrase.phraseMatches(docs, "b"))
    assert(batch == Map(1L -> ((1L, 3)), 3L -> ((2L, 1))))
    assert(collect(Phrase.phraseSearchIndexed(Phrase.positionalPostings(docs), "b")) == batch)
  }
}
