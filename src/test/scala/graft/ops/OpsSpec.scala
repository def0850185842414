package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine similarity: known vectors") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .bruteForceTopK(df, df.where(col("vec_id") === 0), k = 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(out(0)._1 == 2L && math.abs(out(0)._2 - 0.707107) < 1e-6)
    assert(out(1)._1 == 1L && math.abs(out(1)._2 - 0.0) < 1e-12)
  }

  test("exact dedup groups identical texts") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val out = DedupDocs.exactGroups(df).orderBy("keeper_doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L), (2L, 1L)))
  }

  test("shingles: distinct word k-grams") {
    val df = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val out = DedupDocs.shingles(df, 3).orderBy("shingle").collect().map(_.getString(1))
    assert(out.toSeq == Seq("a b c", "b c d"))
  }

  test("ngram jaccard finds identical docs in same block") {
    val df = Seq(
      (0L, "a b c d e f", "s1"),
      (1L, "a b c d e f", "s1"),
      (2L, "q r s t u v", "s1")
    ).toDF("doc_id", "text", "source")
    val out = DedupDocs.ngramJaccardPairs(df, 3, 0.8, "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("minhash LSH pairs identical docs, skips disjoint") {
    val df = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g h"),
      (2L, "q r s t u v w x")
    ).toDF("doc_id", "text")
    val out = DedupDocs.minhashLshPairs(df, 3, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("containment flags a short doc quoted inside a long one that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon"
    val long = s"one two three four five six seven eight nine ten $short eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val df = Seq((0L, long, "s"), (1L, short, "s"), (2L, "unrelated words only here", "s"))
      .toDF("doc_id", "text", "source")
    val got = DedupDocs.ngramContainmentPairs(df, 3, threshold = 0.9, blockCol = "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 1)
    val (a, b, c, j) = got.head
    // every shingle of the short doc appears in the long one ⇒ containment 1
    assert((a, b) == ((0L, 1L)) && c == 1.0)
    assert(j < 0.15, s"jaccard $j should be small — that's the point")
    // and the Jaccard form at a 0.8 threshold does NOT surface the pair
    assert(DedupDocs.ngramJaccardPairs(df, 3, 0.8, "source").count() == 0L)
  }

  test("sourceOverlapMatrix rolls LSH pairs up to normalized source pairs") {
    val df = Seq(
      (0L, "a b c d e f g h", "web"),
      (1L, "a b c d e f g h", "books"), // cross-source dup
      (2L, "a b c d e f g h", "web"),   // within-web dup of 0
      (3L, "q r s t u v w x", "books")
    ).toDF("doc_id", "text", "source")
    val out = DedupDocs.sourceOverlapMatrix(df, 3, 16, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // pairs: (0,1) web/books, (0,2) web/web, (1,2) books/web — normalized
    assert(out == Set(("books", "web", 2L), ("web", "web", 1L)))
  }

  test("topNgrams ranks per group by count with deterministic tie-break") {
    val df = Seq(
      (0L, "a b a b a b", "s1"), // bigrams in s1: "a b"×3, "b a"×2
      (1L, "c d", "s1"),
      (2L, "z z z", "s2") // "z z"×2
    ).toDF("doc_id", "text", "source")
    val out = Text.topNgrams(df, n = 2, k = 2, groupCols = Seq("source"))
      .orderBy("source", "rank")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("s1", "a b", 3L, 1),
      ("s1", "b a", 2L, 2), // beats "c d" (count 1); ties break gram-asc
      ("s2", "z z", 2L, 1)
    ))
  }

  test("topNgrams minCount prunes before the rank window") {
    val df = Seq((0L, "a b a b c d", "s1")).toDF("doc_id", "text", "source")
    val out = Text.topNgrams(df, n = 2, k = 10, minCount = 2L)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a b", 2L)))
  }

  test("topNgrams kernel form equals the HOF formulation") {
    val rnd = new scala.util.Random(6553)
    val df = (0 until 60).map { i =>
      val text = (0 until rnd.nextInt(30))
        .map(_ => Seq("a", "b", "cc", "")(rnd.nextInt(4))).mkString(" ")
      (i.toLong, text, s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("source", "rank").collect().map(_.toSeq).toList
    (1 to 3).foreach { n =>
      assert(canon(Text.topNgrams(df, n, 5)) == canon(Text.topNgramsHof(df, n, 5)), s"n=$n")
    }
  }

  test("token stats") {
    val df = Seq((0L, "the cat the hat")).toDF("doc_id", "text")
    val r = Text.tokenStats(df).first()
    assert(r.getLong(1) == 4) // tokens
    assert(r.getLong(2) == 3) // uniq
    assert(r.getLong(4) == 12) // chars nospace
  }

  test("regex token stats count class runs and punct ratio") {
    val df = Seq((0L, "ab12 cd, x-9!")).toDF("doc_id", "text")
    // alpha runs: ab, cd, x; num runs: 12, 9; punct runs: ",", "-", "!"
    val r = Text.regexTokenStats(df).first()
    assert(r.getLong(1) == 3) // n_alpha
    assert(r.getLong(2) == 2) // n_num
    assert(r.getLong(3) == 3) // n_punct
    assert(r.getLong(4) == 8) // n_bpe_tokens
    assert(r.getDouble(5) == 0.375) // punct ratio
  }

  test("connected components merge pair chains transitively") {
    val docs = (0L to 6L).toDF("doc_id")
    // chain 0-1-2, pair 4-5, isolated 3 and 6
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val cc = DedupDocs
      .connectedComponents(docs, pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(cc == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("ngram jaccard maxDocFreq drops stopword shingles from the universe") {
    // "x y z" appears in ALL four docs (the stopword shingle); each pair
    // of (0,1) and (2,3) also shares a rare discriminating shingle set
    val df = Seq(
      (0L, "x y z a b c", "s"),
      (1L, "x y z a b c", "s"),
      (2L, "x y z d e f", "s"),
      (3L, "x y z d e f", "s")
    ).toDF("doc_id", "text", "source")
    // exact: identical docs pair at jaccard 1.0
    val exact = DedupDocs.ngramJaccardPairs(df, k = 3, threshold = 0.9, blockCol = "source")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 1L), (2L, 3L)))
    // cap at 2: the 4-doc "x y z" bucket is dropped; identical pairs
    // still reach 1.0 on their remaining shingles
    val capped = DedupDocs
      .ngramJaccardPairs(df, k = 3, threshold = 0.9, blockCol = "source", maxDocFreq = Some(2))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L), (2L, 3L)))
  }

  test("star LSH pairs yield the SAME clusters as all-pairs, with O(m) edges") {
    // six near-identical docs (one LSH bucket) + two distinct singletons
    val docs = (0L to 7L).map { i =>
      val text =
        if (i <= 5) "the quick brown fox jumps over the lazy dog again today"
        else s"utterly unrelated content number $i zz qq ww ee rr tt yy uu"
      (i, text)
    }.toDF("doc_id", "text")
    val all = DedupDocs.minhashLshPairs(docs, k = 3, numHashes = 16, rowsPerBand = 4)
    val star = DedupDocs.minhashLshPairs(docs, k = 3, numHashes = 16, rowsPerBand = 4, star = true)
    assert(star.count() < all.count()) // 5 star edges vs 15 pairs for the 6-clique
    val ccOf = (p: org.apache.spark.sql.DataFrame) =>
      DedupDocs.connectedComponents(docs.select("doc_id"), p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccOf(star) == ccOf(all))
  }

  test("connected components handle non-Long doc ids (skip the driver fast path)") {
    // string ids: the driver union-find unions primitive longs, so the
    // fast path must gate itself off and the distributed loop must give
    // the same (min-label) components under string ordering
    val docs = Seq("a", "b", "c", "z").toDF("doc_id")
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val cc = DedupDocs.connectedComponents(docs, pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }

  test("connected components pointer-jump past maxIters-deep chains") {
    // a 120-long path has diameter 119 — plain min-propagation would blow
    // the maxIters=40 guard; the pointer-jumping loop must close it in
    // ~log2(119) rounds. driverEdgeLimit=0 forces the distributed path.
    val docs = (0L to 119L).toDF("doc_id")
    val pairs = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    var rounds = 0
    val cc = DedupDocs
      .connectedComponents(docs, pairs, driverEdgeLimit = 0L,
        progress = (r, _) => rounds = r)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (0L to 119L).map(_ -> 0L).toMap)
    assert(rounds <= 12, s"expected O(log diameter) convergence, took $rounds rounds")
  }

  test("connected components stay scoped to the docs-induced subgraph") {
    // pairs reference doc 3, which is NOT in docs: 5 and 7 must remain
    // separate singletons, not merge through the outside vertex
    val docs = Seq(5L, 7L).toDF("doc_id")
    val pairs = Seq((3L, 5L), (3L, 7L)).toDF("doc_a", "doc_b")
    val cc = DedupDocs.connectedComponents(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(5L -> 5L, 7L -> 7L))
  }

  test("simhash handles documents beyond the old lane capacity; lane form still rejects") {
    // the native kernel (int vote counters) has no token bound — a doc
    // past the lane form's 32 767 cap must hash, and hash identically to
    // a collapsed equivalent (all-same-token votes are sign-stable)
    val big = (0L, Seq.fill(40000)("tok").mkString(" "))
    val one = (0L, "tok")
    val df = Seq(big).toDF("doc_id", "text")
    val hBig = DedupDocs.simhash(df).collect()(0).getLong(1)
    val hOne = DedupDocs.simhash(Seq(one).toDF("doc_id", "text")).collect()(0).getLong(1)
    assert(hBig == hOne) // unanimous votes → same sign per bit
    // the retained lane formulation keeps its loud pre-aggregation guard
    val e = intercept[Exception] {
      DedupDocs.simhashHof(df).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("chunk the document")), e.toString)
  }

  test("ngram jaccard: NULL-block docs join to nothing (equi-join semantics)") {
    val df = Seq(
      (0L, "a b c d e f", Option("s1")),
      (1L, "a b c d e f", Option("s1")),
      (2L, "a b c d e f", None), // NULL block: must pair with nobody
      (3L, "a b c d e f", None)
    ).toDF("doc_id", "text", "source")
    val pairs = DedupDocs
      .ngramJaccardPairs(df, k = 3, threshold = 0.8, blockCol = "source")
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("simhash banded near-dup pairs identical docs at hamming 0") {
    val df = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // identical -> hamming 0
      (2L, "utterly different words entirely qq zz")
    ).toDF("doc_id", "text")
    val pairs = DedupDocs
      .simhashNearDupPairs(df, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 0L)))
  }

  test("simhash of identical docs is identical, differs for different docs") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val out = DedupDocs.simhash(df).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(0L) == out(1L))
    assert(out(0L) != out(2L))
  }

  test("corpusStatsApprox (the scale form) tracks the exact report") {
    val rnd = new scala.util.Random(4242)
    val df = (0L until 400L).map { i =>
      val src = s"s${i % 3}"
      (i, (0 to rnd.nextInt(50)).map(_ => "w").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    def byKey(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r).toMap
    val exact = byKey(Text.corpusStats(df))
    val approx = byKey(Text.corpusStatsApprox(df))
    assert(exact.keySet == approx.keySet)
    exact.keySet.foreach { s =>
      // counts/sums/means identical; percentiles within one token at
      // this accuracy (t-digest vs interpolating exact)
      assert(exact(s).getLong(1) == approx(s).getLong(1), s"n_docs $s")
      assert(exact(s).getLong(2) == approx(s).getLong(2), s"total_tokens $s")
      assert(exact(s).getDouble(3) == approx(s).getDouble(3), s"mean_tokens $s")
      assert(math.abs(exact(s).getDouble(4) - approx(s).getDouble(4)) <= 1.0, s"p50 $s")
      assert(math.abs(exact(s).getDouble(5) - approx(s).getDouble(5)) <= 1.0, s"p90 $s")
    }
  }

  test("canonicalPerCluster keeps the argmax-score member, ties break by doc_id") {
    val clusters = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // cluster 100
      (4L, 200L), (5L, 200L),             // cluster 200: tied scores
      (6L, 300L)                          // singleton
    ).toDF("doc_id", "cluster_id")
    val scores = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.5),
      (4L, 0.7), (5L, 0.7),
      (6L, 0.1)
    ).toDF("doc_id", "s")
    val out = DedupDocs.canonicalPerCluster(clusters, scores, "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(2L) == ((100L, true)) && !out(1L)._2 && !out(3L)._2, "argmax wins")
    assert(out(4L) == ((200L, true)) && !out(5L)._2, "tie breaks by smaller doc_id")
    assert(out(6L) == ((300L, true)), "singleton keeps itself")
    assert(out.size == 6)
  }
}
