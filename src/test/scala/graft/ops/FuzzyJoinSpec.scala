package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
/** [[FuzzyJoin]] — deletion-neighborhood candidate completeness and
  * exactness of the verified output, pinned against brute-force
  * levenshtein over small universes (incl. seeded random ones over a
  * 3-letter alphabet, where near-miss pairs are dense by
  * construction). */
class FuzzyJoinSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Pure-Scala reference: all pairs a < b with lev(a,b) ≤ d. */
  private def brutePairs(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val u = strs.distinct.filter(_.nonEmpty)
    (for {
      a <- u; b <- u if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(
          math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def runPairs(strs: Seq[String], d: Int): Set[(String, String, Int)] =
    FuzzyJoin
      .editDistancePairs(strs.toDF("s"), "s", d)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("editDistancePairs d=1: substitutions, insertions, deletions all surface; far pairs don't") {
    val strs = Seq("kitten", "sitten", "kitte", "kittens", "mitten", "dog", "dot", "unrelated")
    assert(runPairs(strs, 1) == brutePairs(strs, 1))
  }

  test("editDistancePairs d=2 matches brute force (incl. transposition = 2 edits)") {
    val strs = Seq("abcd", "abdc", "abcde", "ab", "xbcd", "xycd", "zzzz")
    assert(runPairs(strs, 2) == brutePairs(strs, 2))
  }

  test("duplicate input strings are one distinct value; empty/null dropped") {
    val df = Seq(Some("aa"), Some("aa"), Some("ab"), Some(""), None).toDF("s")
    val got = FuzzyJoin.editDistancePairs(df, "s", 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("aa", "ab", 1)))
  }

  test("seeded random universes over {a,b,c} equal brute force (d=1 and d=2)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val strs = Seq.fill(12)(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString)
      val d = 1 + trial % 2
      assert(runPairs(strs, d) == brutePairs(strs, d), s"trial $trial d=$d strs=$strs")
    }
  }

  test("linkToDictionary: min-distance match, bytewise tie-break, unmatched probes dropped") {
    val probe = Seq("kat", "dog", "zzz").toDF("p")
    val dict = Seq("cat", "bat", "dig", "dug").toDF("w")
    val got = FuzzyJoin.linkToDictionary(probe, "p", dict, "w", 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // kat→{bat,cat} dist 1 → tie-break "bat"; dog→{dig,dug} → "dig"; zzz unmatched
    assert(got == Set(("kat", "bat", 1), ("dog", "dig", 1)))
  }

  test("linkToDictionary: exact match (dist 0) beats any dist-1 candidate") {
    val probe = Seq("cat").toDF("p")
    val dict = Seq("cat", "bat").toDF("w")
    val got = FuzzyJoin.linkToDictionary(probe, "p", dict, "w", 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("cat", "cat", 0)))
  }

  test("capped buckets: tiny cap sheds the degenerate short-key mass, variantShed counts it") {
    // 30 distinct 1–2 char strings over {a,b}: with d=1 the ""-variant
    // bucket holds every length-1 string and the single-char variants
    // are dense — classic degenerate corpus.
    val strs = (for {
      a <- 'a' to 'b'; b <- Seq("", "a", "b", "aa", "ab", "ba", "bb")
    } yield s"$a$b") ++ Seq("a", "b")
    val df = strs.toDF("s")
    // generous cap → exact (brute parity)
    assert(
      FuzzyJoin.editDistancePairs(df, "s", 1, maxBucket = 1000).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        == brutePairs(strs, 1))
    // cap 2 → every over-cap bucket shed; result ⊆ brute, bounded work
    val capped = FuzzyJoin.editDistancePairs(df, "s", 1, maxBucket = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(capped.subsetOf(brutePairs(strs, 1)))
    // the shed diagnostic reports exactly the buckets over the cap
    val shed = FuzzyJoin.variantShed(df, "s", 1, maxBucket = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(shed.nonEmpty && shed.values.forall(_ > 2))
    assert(shed.contains("a") || shed.contains("b")) // dense single-char variants
    // and with the generous cap nothing is shed
    assert(FuzzyJoin.variantShed(df, "s", 1, maxBucket = 1000).isEmpty)
  }

  test("cappedStringSet ≡ size(collect_set) <= cap filter (sorted members, NULL over cap)") {
    val df = Seq(
      ("k1", "b"), ("k1", "a"), ("k1", "a"), ("k1", "c"),
      ("k2", "x"), ("k2", "y"), ("k3", "z")).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(graft.functions.CappedStringSet.cappedStringSet(col("v"), 2).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toList)).toMap
    assert(got == Map("k1" -> None, "k2" -> Some(List("x", "y")), "k3" -> Some(List("z"))))
  }

  test("linkToDictionary with a saturating cap still links through in-cap variants") {
    // dict of 1-char words saturates the "" variant at cap 2, but each
    // probe still reaches its exact match through the identity variant
    val dict = Seq("a", "b", "c", "d", "e").toDF("w")
    val probe = Seq("a", "e").toDF("p")
    val got = FuzzyJoin.linkToDictionary(probe, "p", dict, "w", 1, maxBucket = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("a", "a", 0), ("e", "e", 0)))
  }

  test("deletionVariants: exact sets for small strings") {
    def variants(str: String, d: Int): Set[String] =
      Seq(str).toDF("s")
        .select(explode(FuzzyJoin.deletionVariants(col("s"), d)).as("v"))
        .collect().map(_.getString(0)).toSet
    assert(variants("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(variants("abc", 2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(variants("a", 1) == Set("a", ""))
  }
}
