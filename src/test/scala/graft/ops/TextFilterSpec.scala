package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Text.gopherFilter]] + [[Text.stripHtml]] semantics. */
class TextFilterSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("encodingArtifacts: double-decode shapes flag, genuine accents never do") {
    val rows = Seq(
      (1L, "CafÃ© on the corner"),          // Latin-1 double decode: Ã + © tail
      (2L, "donâ€™t say â€œhiâ€"),          // cp1252 quotes: 3 lead+tail pairs
      (3L, "damaged � byte"),               // replacement char only
      (4L, "não façade naïve NÃO BASTA"),   // clean accents — upper Ã is
      (5L, "plain ascii text")              // followed by ASCII, not a tail
    ).toDF("doc_id", "text")
    val got = Text.encodingArtifacts(rows).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((1, 0, 1)))
    assert(got(2L) == ((3, 0, 1)))
    assert(got(3L) == ((0, 1, 1)))
    assert(got(4L) == ((0, 0, 0)))
    assert(got(5L) == ((0, 0, 0)))
  }

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

  test("winnowFingerprints: MOSS guarantee — docs sharing a >= w+k-1 token substring share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1 with k=3, w=4
    val docs = Seq(
      (1L, s"xx yy $shared zz"),
      (2L, s"$shared qq rr ss tt"),
      (3L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val fp = Text.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty, "shared substring must share a fingerprint")
    assert((fp(1L) intersect fp(3L)).isEmpty)
  }

  test("winnowFingerprints: short docs emit nothing; single-window doc emits exactly one selection") {
    val docs = Seq(
      (1L, "a b c d e"),       // 5 tokens, 3 grams < w=4 windows -> nothing
      (2L, "a b c d e f")      // 6 tokens, 4 grams = exactly one window -> 1 fp
    ).toDF("doc_id", "text")
    val got = Text.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(!got.exists(_._1 == 1L))
    assert(got.count(_._1 == 2L) == 1)
  }

  test("winnowFingerprints: equal hashes in a window pick the RIGHTMOST position") {
    // identical grams -> identical hashes; window of 4 equal hashes
    // must select the last position in each window
    val docs = Seq((1L, "a a a a a a a a a")).toDF("doc_id", "text") // 9 tokens, 7 identical 3-grams
    val got = Text.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(r => r.getInt(1)).sorted.toSeq
    // windows start at 0..3; window i covers [i, i+3] -> rightmost = i+3
    assert(got == Seq(3, 4, 5, 6))
  }

  test("readability: hand-computed counts and exact milli-point scores; empty-text floors") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat. The dog ran fast! Really?"),
      (2L, "")).toDF("doc_id", "text")
    val got = Text.readability(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // 8 words, 3 sentence runs, 9 syllables (really = ea + y runs);
    // FRE*1000 = (206835*3*8 - 1015*64 - 84600*9*3) / 24 = 2614880/24
    // -> 108953 (half-away); FK*1000 = -30600/24 = -1275 exact
    assert(got(1L) == ((8L, 3L, 9L, 108953L, -1275L)))
    // empty text: all counts floor to 1
    assert(got(2L) == ((1L, 1L, 1L, 121220L, -3400L)))
  }

  test("readability: monotone — more syllables per word lowers ease, raises grade") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d. e f g h."),                  // monosyllabic
      (2L, "elaborate vocabulary everywhere obviously. academia prioritizes polysyllabic terminology.")
    ).toDF("doc_id", "text")
    val got = Text.readability(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got(1L)._1 > got(2L)._1, "simple text must read easier")
    assert(got(1L)._2 < got(2L)._2, "simple text must grade lower")
  }

  test("compressionRatio: repetitive text compresses far below varied text; empty text is 0-size") {
    val rep = ("spam " * 200).trim
    val varied = (0 until 200).map(i => (i * 2654435761L).toHexString).mkString(" ").take(rep.length)
    val docs = Seq((1L, rep), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val got = Text.compressionRatio(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (repBytes, repComp, repRatio) = got(1L)
    val (varBytes, varComp, varRatio) = got(2L)
    assert(repBytes == varBytes)
    assert(repComp < varComp && repRatio < varRatio,
      s"repetitive $repComp/$repRatio should compress below varied $varComp/$varRatio")
    assert(repRatio < 0.05 && varRatio > 0.4)
    // empty input still emits the 2-byte raw-deflate terminator block;
    // the max(n_bytes, 1) denominator keeps the ratio finite
    assert(got(3L) == ((0L, 2L, 2.0)))
  }

  test("deflateSize is deterministic across invocations and rows") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val sizes = Text.compressionRatio(docs).collect().map(_.getLong(2))
    assert(sizes(0) == sizes(1) && sizes(0) > 0)
  }

  test("winnowFingerprints: native kernel is bit-identical to the HOF equivalence oracle") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "x x x y x x z x x x x"),
      (3L, "one two three four five six seven eight two three four five"),
      (4L, "a  b   c d e f g"), // space runs -> empty tokens
      (5L, "short"),
      (6L, "")
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (2, 5), (1, 3))) {
      val kern = Text.winnowFingerprints(docs, k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val hof = Text.winnowFingerprintsHof(docs, k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(kern == hof, s"k=$k w=$w")
    }
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

  test("tokenDrift: identical corpora → 0; disjoint → ln 2; partition-order-free") {
    import spark.implicits._
    val x = Seq("a b c", "a a d").toDF("text")
    val same = Text.tokenDrift(x, x).head()
    assert(same.getLong(0) == 6L && same.getLong(1) == 6L && same.getLong(2) == 4L)
    assert(same.getDouble(3) == 0.0)
    val y = Seq("p q", "r r").toDF("text")
    val disjoint = Text.tokenDrift(x, y).head()
    assert(disjoint.getDouble(3) == 0.693147) // ln 2 at 6dp
    // hand-checked asymmetric case, invariant under repartitioning
    val big = spark.range(0, 5000)
      .select(concat(lit("t"), (col("id") % 50).cast("string")).as("text"))
    val shifted = spark.range(0, 5000)
      .select(concat(lit("t"), (col("id") % 60).cast("string")).as("text"))
    val j1 = Text.tokenDrift(big, shifted).head().getDouble(3)
    val j2 = Text.tokenDrift(big.repartition(13), shifted.repartition(7)).head().getDouble(3)
    assert(j1 == j2 && j1 > 0.0 && j1 < 0.693147, s"$j1 vs $j2")
  }
}
