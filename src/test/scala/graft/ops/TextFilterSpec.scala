package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Text.gopherFilter]] + [[Text.stripHtml]] semantics. */
class TextFilterSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("gopherFilter: each rule rejects independently, a good doc passes") {
    val rows = Seq(
      // 10 tokens, mwl 4.1, stop 0.2, ttr 0.9 — passes everything
      (1L, "the quick brown foxes jumped over a very lazy dogs"),
      (2L, "too short"),                                      // n_tokens < 4
      (3L, "a a a a a a a a a a"),                            // ttr + mwl fail
      (4L, "quick brown foxes jumped over very lazy dogs here now") // no stopwords
    ).toDF("doc_id", "text")
    val got = Text.gopherFilter(rows,
      minTokens = 4, maxTokens = 100, minMwl = 2.0, maxMwl = 10.0,
      minStopRatio = 0.05, minTtr = 0.5)
      .select("doc_id", "passes").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0))
  }

  test("langIdWithMargin: margin separates confident picks from ties; und has margin 0 semantics") {
    val markers = Map("en" -> Seq("the", "a"), "fr" -> Seq("le", "un"))
    val rows = Seq(
      (1L, "the a the word"),   // en 3, fr 0 -> margin 3
      (2L, "the le word"),      // tie 1-1 -> en (alphabetical), margin 0
      (3L, "word only here")    // und, best 0, margin 0
    ).toDF("doc_id", "text")
    val got = Text.langIdWithMargin(rows, markers)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, "en", 3L, 3L), (2L, "en", 1L, 0L), (3L, "und", 0L, 0L)))
    // agrees with langId's pick on every row
    val picks = Text.langId(rows, markers).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.map(t => (t._1, t._2)) == picks)
  }

  test("langIdWithMargin: single-language marker map degrades margin to best_count, not NULL") {
    val markers = Map("en" -> Seq("the", "a"))
    val rows = Seq(
      (1L, "the a the word"), // en 3 -> margin 3 (no runner-up)
      (2L, "word only here")  // und, best 0, margin 0
    ).toDF("doc_id", "text")
    val got = Text.langIdWithMargin(rows, markers)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, "en", 3L, 3L), (2L, "und", 0L, 0L)))
  }

  test("stripHtml: tags and script/style content drop, entities decode in order, whitespace collapses") {
    val rows = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "<script>var hidden = 'secret';</script>visible<style>h1{}</style>"),
      // script bodies with '<' (comparisons) — the real-world shape
      (7L, "<script>if (a<b && c<d) alert(1)</script>kept<script>x<1</script>"),
      (3L, "tom &amp; jerry &lt;3 &quot;quoted&#39;"),
      // double-encoded: &amp;lt; must decode to the LITERAL '&lt;', not '<'
      (4L, "escaped: &amp;lt;tag&amp;gt;"),
      (5L, "<div class=\"a\" data-x='1'>attrs</div>"),
      (6L, "  <p>  spaced   out  </p>  ")
    ).toDF("doc_id", "text")
    val got = Text.stripHtml(rows)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "hello world")
    assert(got(2L) == "visible")
    assert(got(7L) == "kept")
    assert(got(3L) == "tom & jerry <3 \"quoted'")
    assert(got(4L) == "escaped: &lt;tag&gt;")
    assert(got(5L) == "attrs")
    assert(got(6L) == "spaced out")
  }
}
