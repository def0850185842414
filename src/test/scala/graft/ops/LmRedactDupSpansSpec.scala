package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-LM scoring, duplicated-span coverage, and regex redaction:
  * hand-computed fixtures, path equivalence (broadcast vs shuffled LM
  * join), and the PII patterns on injected fixtures (the synthetic
  * corpus has no digits/'@', so the driver oracle only exercises the
  * blocklist form). */
class LmRedactDupSpansSpec extends SparkSpec {
  import spark.implicits._

  // --- Lm -------------------------------------------------------------

  private val lmDocs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")

  test("ccnetBuckets: value-cut thirds per language, equal-ppl docs share a bucket") {
    // bypass lmScore: feed a prebuilt scored frame so bucket arithmetic
    // is pinned directly. lang L1: ppl 1,1,2,3,3,9 (n=6) ->
    // n_less(1)=0 head, n_less(2)=2 3*2=6<12 middle, n_less(3)=3
    // 9<12 middle... wait 3*3=9 >= 6 so not head; 9 < 12 middle;
    // n_less(9)=5 15>=12 tail. lang L2: single doc -> head.
    val scored = Seq(
      (1L, "L1", 1.0), (2L, "L1", 1.0), (3L, "L1", 2.0),
      (4L, "L1", 3.0), (5L, "L1", 3.0), (6L, "L1", 9.0),
      (7L, "L2", 42.0)
    ).toDF("doc_id", "lang", "ppl")
    val got = Lm.ccnetBuckets(scored.select("doc_id"), scoredIn = Some(scored))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(
      1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "middle", 6L -> "tail",
      7L -> "head"))
  }

  test("ccnetBuckets end-to-end over lmScore carries lang and splits ~equally") {
    val docs = Seq(
      (0L, "a a b", "en"), (1L, "b c", "en"), (2L, "a b c", "en"),
      (3L, "zz qq", "fr"), (4L, "a a a", "fr"), (5L, "b b", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = Lm.ccnetBuckets(docs).collect()
    assert(got.length == 6)
    val buckets = got.map(_.getString(3)).toSet
    assert(buckets.subsetOf(Set("head", "middle", "tail")))
    // every lang has a head (n_less=0 always satisfies 0 < n)
    val headLangs = got.filter(_.getString(3) == "head").map(_.getString(1)).toSet
    assert(headLangs == Set("en", "fr"))
  }

  test("lmScore: hand-computed add-1 unigram log-probs") {
    // counts: a=2 b=2 c=1; N=5, V=3, denom=8
    val out = Lm.lmScore(lmDocs).orderBy("doc_id").collect()
    val d0 = out(0)
    assert(d0.getLong(1) == 3L)
    // all three tokens have p=3/8 → avg = ln(0.375) = -0.980829...
    assert(math.abs(d0.getDouble(2) - -0.9808) < 1e-9)
    // ppl from the unrounded avg: exp(ln(8/3)) = 8/3
    assert(math.abs(d0.getDouble(3) - 2.6667) < 1e-9)
    val d1 = out(1)
    assert(d1.getLong(1) == 2L)
    assert(math.abs(d1.getDouble(2) - -1.1836) < 1e-9) // (ln(3/8)+ln(2/8))/2
    assert(math.abs(d1.getDouble(3) - 3.266) < 1e-9) // sqrt(32/3)
  }

  test("lmScore: shuffled-join fallback matches the broadcast path") {
    val broadcastPath = Lm.lmScore(lmDocs).orderBy("doc_id").collect().toSeq
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Lm.lmScore(lmDocs).orderBy("doc_id").collect().toSeq
      assert(shuffled == broadcastPath)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  // --- DedupDocs.dupSpans ---------------------------------------------

  test("dupSpans: cross-doc shared grams, coverage union, short docs") {
    val docs = Seq(
      (0L, "a b c d e"), // "a b c","b c d" shared with doc1
      (1L, "x a b c d y"),
      (2L, "p q") // shorter than k → all zeros
    ).toDF("doc_id", "text")
    val out = DedupDocs
      .dupSpans(docs, k = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc0: starts {0,1} cover positions {0,1,2,3} of 5 tokens
    assert(out(0) == ((0L, 5L, 2L, 4L, 0.8)))
    // doc1: starts {1,2} cover {1,2,3,4} of 6
    assert(out(1) == ((1L, 6L, 2L, 4L, 0.6667)))
    assert(out(2) == ((2L, 2L, 0L, 0L, 0.0)))
  }

  test("dupSpans: within-doc repetition counts as duplication") {
    val docs = Seq((0L, "m n o m n o m n o")).toDF("doc_id", "text")
    // every 3-gram repeats within the doc → full coverage
    val out = DedupDocs.dupSpans(docs, k = 3).collect()(0)
    assert(out.getLong(1) == 9L && out.getLong(2) == 7L && out.getLong(3) == 9L)
    assert(out.getDouble(4) == 1.0)
  }

  test("dupSpans: unique corpus reports zero everywhere") {
    val docs = Seq((0L, "a b c d"), (1L, "e f g h")).toDF("doc_id", "text")
    val out = DedupDocs.dupSpans(docs, k = 3).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getDouble(4) == 0.0))
  }

  test("gramHashes kernel equals md5 of the HOF gram strings") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, ""), // single empty token
      (2L, "  a  b "), // empty tokens from leading/consecutive/trailing spaces
      (3L, "héllo wörld ünïcode tokens here"),
      (4L, "a b") // fewer than k tokens → NULL
    ).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val hof = when(
      size(toks) >= 3,
      transform(
        sequence(lit(0), size(toks) - 3),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(3))).cast("binary"))
      )
    )
    val native = transform(
      graft.functions.GramHashes.gramHashes(col("text"), 3),
      g => lower(hex(g))
    )
    val rows = docs
      .select(col("doc_id"), hof.as("h"), native.as("n"))
      .orderBy("doc_id")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch for doc ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getSeq[String](1) == r.getSeq[String](2))
    }
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(2))
  }

  test("GramXxPair: equal grams collide, distinct grams differ per seed, <k is NULL") {
    val docs = Seq(
      (0L, "p q r s"),   // grams: "p q r", "q r s"
      (1L, "x p q r s"), // shares both grams of doc 0, shifted
      (2L, "a b")        // fewer than k=3 tokens → NULL
    ).toDF("doc_id", "text")
    val rows = docs
      .select(col("doc_id"), graft.functions.GramXxPair.gramXxPair(col("text"), 3).as("h"))
      .orderBy("doc_id").collect()
    val h0 = rows(0).getSeq[Array[Byte]](1).map(_.toSeq)
    val h1 = rows(1).getSeq[Array[Byte]](1).map(_.toSeq)
    assert(h0.size == 2 && h1.size == 3)
    assert(h0.forall(_.size == 16))
    assert(h1.drop(1) == h0)      // same gram text → same key, any position
    assert(h0.distinct.size == 2) // distinct grams hash apart
    // the two seeds are independent streams: halves of each key differ
    h0.foreach(k => assert(k.take(8) != k.drop(8)))
    assert(rows(2).isNullAt(1))
  }

  test("dupSpans: digest form equals the string-gram form on a random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0L until 60L)
      .map(i => (i, Seq.fill(5 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val native = DedupDocs.dupSpans(docs, k = 4).orderBy("doc_id").collect().toSeq
    val hof = DedupDocs.dupSpansHof(docs, k = 4).orderBy("doc_id").collect().toSeq
    assert(native == hof)
    // the tiny vocab guarantees real duplication — the comparison is not vacuous
    assert(native.exists(_.getLong(2) > 0L))
    // the retained MD5-identity baselines must agree row-for-row with
    // the xx-pair default
    val md5Form = DedupDocs.dupSpansMd5(docs, k = 4).orderBy("doc_id").collect().toSeq
    assert(md5Form == native)
    val strip = DedupDocs.stripDupSpans(docs, k = 4).orderBy("doc_id").collect().toSeq
    val stripMd5 =
      DedupDocs.stripDupSpansMd5(docs, k = 4).orderBy("doc_id").collect().toSeq
    assert(stripMd5 == strip)
  }

  test("stripDupSpans: hand-computed removal, within-doc dups, short docs") {
    val docs = Seq(
      (0L, "x p q r y"), // "p q r" duplicated corpus-wide → covered
      (1L, "z p q r w"),
      (2L, "a b"), // fewer than k tokens → no grams, untouched
      (3L, "p q r p q r"), // within-doc duplicate gram → fully covered
      (4L, "u v w x y") // unique grams → untouched
    ).toDF("doc_id", "text")
    val out = DedupDocs
      .stripDupSpans(docs, k = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((0L, "x y", 5L, 3L)))
    assert(out(1) == ((1L, "z w", 5L, 3L)))
    assert(out(2) == ((2L, "a b", 2L, 0L)))
    assert(out(3) == ((3L, "", 6L, 6L)))
    assert(out(4) == ((4L, "u v w x y", 5L, 0L)))
  }

  test("stripDupSpans: digest form equals string-gram form; n_removed equals dupSpans coverage") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0L until 60L)
      .map(i => (i, Seq.fill(5 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val native = DedupDocs.stripDupSpans(docs, k = 4).orderBy("doc_id").collect().toSeq
    val hof = DedupDocs.stripDupSpansHof(docs, k = 4).orderBy("doc_id").collect().toSeq
    assert(native == hof)
    // removal count must equal the dupSpans coverage count doc by doc —
    // the two ops share the maximal-span contract
    val cov = DedupDocs
      .dupSpans(docs, k = 4)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap
    native.foreach(r => assert(r.getLong(3) == cov(r.getLong(0)), s"doc ${r.getLong(0)}"))
    assert(native.exists(_.getLong(3) > 0L))
  }

  // --- Redact ----------------------------------------------------------

  test("stripDupLines: cross-doc boilerplate removed everywhere, within-doc repeats kept") {
    val docs = Seq(
      (0L, "cookie banner\nreal content A\ncookie banner"), // banner dups across docs AND within
      (1L, "cookie banner\nreal content B"),
      (2L, "solo line\nsolo line"), // repeated only WITHIN one doc → kept
      (3L, "")                      // one empty line; unique → kept
    ).toDF("doc_id", "text")
    val out = DedupDocs.stripDupLines(docs, minDocs = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((0L, "real content A", 3L, 2L))) // both banner copies removed
    assert(out(1) == ((1L, "real content B", 2L, 1L)))
    assert(out(2) == ((2L, "solo line\nsolo line", 2L, 0L)))
    assert(out(3) == ((3L, "", 1L, 0L)))
  }

  test("stripDupLines: minDocs threshold counts distinct documents") {
    val docs = Seq(
      (0L, "x\ny"), (1L, "x\nz"), (2L, "x\nw")
    ).toDF("doc_id", "text")
    // "x" is in 3 docs: survives minDocs=4, removed at minDocs=3
    val keep = DedupDocs.stripDupLines(docs, minDocs = 4)
      .agg(sum("n_removed")).collect()(0).getLong(0)
    assert(keep == 0L)
    val drop = DedupDocs.stripDupLines(docs, minDocs = 3)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(drop == Seq("y", "z", "w"))
  }

  test("PII patterns: email, ipv4, phone on injected fixtures") {
    val docs = Seq(
      (0L, "mail john.doe+x@ex-ample.co or jane@site.org now"),
      (1L, "server 10.0.0.1 and 192.168.1.255."),
      (2L, "call 555-123-4567 or 555 123 4567"),
      (3L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = Redact
      .redactReport(docs, Redact.PiiPatterns.All)
      .orderBy("doc_id")
      .collect()
    assert(out(0).getLong(1) == 2L && out(0).getString(4) == "mail <EMAIL> or <EMAIL> now")
    assert(out(1).getLong(2) == 2L && out(1).getString(4) == "server <IP> and <IP>.")
    assert(out(2).getLong(3) == 2L && out(2).getString(4) == "call <PHONE> or <PHONE>")
    assert(out(3).toSeq.slice(1, 4) == Seq(0L, 0L, 0L))
    assert(out(3).getString(4) == "clean text with no pii at all")
  }

  test("redact is idempotent: placeholders never re-match") {
    val docs = Seq((0L, "a@b.co 1.2.3.4 555-123-4567")).toDF("doc_id", "text")
    val once = Redact
      .redact(docs, Redact.PiiPatterns.All)
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = Redact.redactReport(once, Redact.PiiPatterns.All).collect()(0)
    assert(twice.getLong(1) == 0L && twice.getLong(2) == 0L && twice.getLong(3) == 0L)
    assert(twice.getString(4) == "<EMAIL> <IP> <PHONE>")
  }

  test("blocklist pattern respects word boundaries") {
    val docs = Seq((0L, "spark sparky spark")).toDF("doc_id", "text")
    val out = Redact
      .redactReport(docs, Seq(("blocked", Redact.blocklistPattern(Seq("spark")), "[X]")))
      .collect()(0)
    assert(out.getLong(1) == 2L)
    assert(out.getString(2) == "[X] sparky [X]")
  }

  test("blocklist pattern rejects empty lists and regex metacharacters") {
    // \b()\b matches the empty string at every word boundary — refuse it
    intercept[IllegalArgumentException](Redact.blocklistPattern(Seq.empty))
    intercept[IllegalArgumentException](Redact.blocklistPattern(Seq("spark", "")))
    // '.' would match ANY char; the literal-only contract is enforced,
    // not just documented (RE2 oracle cannot mirror \Q…\E quoting)
    intercept[IllegalArgumentException](Redact.blocklistPattern(Seq("a.b")))
    intercept[IllegalArgumentException](Redact.blocklistPattern(Seq("a|b")))
    assert(Redact.blocklistPattern(Seq("foo", "bar-baz")) == "\\b(foo|bar-baz)\\b")
  }

  // --- Lm.bigramScore --------------------------------------------------

  // counts: a=3 b=3 c=2; N=8 V=3 denom=11
  // bigrams: (a,b)=3 (b,a)=1 (b,c)=1
  private val bgDocs =
    Seq((0L, "a b a b"), (1L, "a b c"), (2L, "c")).toDF("doc_id", "text")

  test("bigramScore: hand-computed, minCount=1 (every pair a model hit)") {
    val out = Lm.bigramScore(bgDocs).orderBy("doc_id").collect()
    assert(out.length == 2) // d2 has one token → no bigrams → no row
    // d0: ln(3/3), ln(1/3), ln(3/3) → avg = ln(1/3)/3
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - math.rint(math.log(1.0 / 3) / 3 * 1e4) / 1e4) < 1e-12)
    // d1: ln(3/3), ln(1/3) → avg = ln(1/3)/2
    assert(out(1).getLong(1) == 2L)
    assert(math.abs(out(1).getDouble(2) - math.rint(math.log(1.0 / 3) / 2 * 1e4) / 1e4) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - math.rint(math.exp(-math.log(1.0 / 3) / 2) * 1e4) / 1e4) < 1e-12)
  }

  test("bigramScore: minCount=2 prunes hapax bigrams into the backoff path") {
    val out = Lm.bigramScore(bgDocs, minCount = 2).orderBy("doc_id").collect()
    // model is {(a,b): 3} only; (b,a) and (b,c) back off to
    // 0.4·(c1+1)/11 with c1(a)=3, c1(c)=2
    val backA = math.log(0.4 * 4 / 11.0)
    val backC = math.log(0.4 * 3 / 11.0)
    assert(math.abs(out(0).getDouble(2) - math.rint(backA / 3 * 1e4) / 1e4) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - math.rint(backC / 2 * 1e4) / 1e4) < 1e-12)
  }

  test("bigramScore: shuffled-join fallback matches the broadcast path") {
    val b = Lm.bigramScore(bgDocs, minCount = 2).orderBy("doc_id").collect().toSeq
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val s = Lm.bigramScore(bgDocs, minCount = 2).orderBy("doc_id").collect().toSeq
      assert(s == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  // --- Lm.trigramScore --------------------------------------------------

  test("trigramScore: all three backoff tiers, hand-computed") {
    import spark.implicits._
    // c1: a=3 b=3 c=2 d=1; N=9 V=4; c2: "a b"=3 "b c"=2 "c a"=1 "b d"=1
    // trigrams doc1: "a b c"x2 (hit: ln(2/3)), "b c a" (tier3, c1(a)=3),
    // "c a b" (tier2 via suffix "a b": ln(0.4*(3/3))); doc2: "a b d" (tier3, c1(d)=1)
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = Lm.trigramScore(docs, minCount = 2).orderBy("doc_id").collect()
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val tier3a = math.log(0.4 * (0.4 * ((3.0 + 1.0) / 13.0)))
    val tier3d = math.log(0.4 * (0.4 * ((1.0 + 1.0) / 13.0)))
    val d1 = (2 * math.log(2.0 / 3.0) + tier3a + math.log(0.4 * (3.0 / 3.0))) / 4.0
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 4L)
    assert(got(0).getDouble(2) == r4(d1), got(0).toString)
    assert(got(1).getLong(1) == 1L)
    assert(got(1).getDouble(2) == r4(tier3d))
    // ppl is the monotone transform of the unrounded average
    assert(got(1).getDouble(3) == r4(math.exp(-tier3d)))
  }

  test("trigramScore: docs under 3 tokens produce no row") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "x"), (3L, "a b c")).toDF("doc_id", "text")
    val got = Lm.trigramScore(docs).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }
}
