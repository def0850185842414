package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage without all-pairs — the fuzzy-match
  * family (typosquat/near-domain detection on a crawl, noisy-key
  * entity resolution, spelling-variant collapse) the exact dedup
  * operators cannot see.
  *
  * Candidate generation is the FastSS deletion-neighborhood scheme
  * (Bocek et al., 2007, "Fast Similarity Search in Large
  * Dictionaries"): two strings with Levenshtein distance ≤ d always
  * share a string in their ≤ d-deletion neighborhoods (delete the
  * non-aligned characters of an optimal alignment from each side —
  * at most d per side — and both collapse to the common aligned
  * subsequence). So bucketing on deletion variants is a COMPLETE
  * candidate filter; it is not exact (different strings can collide
  * on a variant), so every candidate pair is verified with the real
  * `levenshtein` before emission. Exact output, no n² anywhere:
  * one exchange keyed on the variant string, quadratic only within a
  * variant bucket (bounded by how many distinct strings actually sit
  * within distance 2d of each other — the near-duplicate mass itself).
  *
  * Cost model: a string of length L has O(L^d) deletion variants —
  * the scheme is for SHORT keys (domains, titles, names, codes; L
  * tens, d ∈ {1, 2}), not document bodies (those are what the
  * MinHash/SimHash families in [[DedupDocs]] are for). At 100 TB the
  * explode is a stateless projection (no shuffle) and the variant
  * exchange carries O(rows × L^d) fixed-width-ish keys — the same
  * shape as the LSH band exchange.
  */
object FuzzyJoin {

  /** All distinct strings reachable from `s` by deleting up to
    * `maxDist` characters (including `s` itself, the 0-deletion
    * variant). Pure Column HOF chain — codegen'd, no UDF. */
  private[graft] def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist must be 1 or 2, got $maxDist")
    // one deletion round: s minus the character at each position
    def delOnce(x: Column): Column =
      transform(
        sequence(lit(1), length(x)),
        i => concat(substring(x, lit(1), i - 1), substring(x, i + 1, length(x))))
    val d1 = delOnce(s)
    val all =
      if (maxDist == 1) concat(array(s), d1)
      else concat(array(s), d1, flatten(transform(d1, v => delOnce(v))))
    array_distinct(all)
  }

  /** Pairs of DISTINCT values of `strCol` within Levenshtein distance
    * `maxDist` (1 ≤ dist ≤ maxDist; identical strings are one distinct
    * value and never pair with themselves). Output:
    * `(str_a, str_b, dist)` with `str_a < str_b` bytewise.
    *
    * Plan: distinct strings → deletion-variant explode (stateless) →
    * ONE exchange on the variant → within-bucket sorted pair explode →
    * pair distinct → levenshtein verify. The verify runs on candidate
    * pairs only (each pair once, not once per shared variant). */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    val strs = df
      .select(col(strCol).as("__s"))
      .where(col("__s").isNotNull && length(col("__s")) > 0)
      .distinct()
    val vars = strs.select(
      col("__s"),
      explode(deletionVariants(col("__s"), maxDist)).as("__v"))
    val buckets = vars
      .groupBy("__v")
      .agg(sort_array(collect_set(col("__s"))).as("__ss"))
      .where(size(col("__ss")) > 1)
    val pairs = buckets
      .select(explode(pairsOf(col("__ss"))).as("__p"))
      .select(col("__p.a").as("str_a"), col("__p.b").as("str_b"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .where(col("dist") <= maxDist)
      .select("str_a", "str_b", "dist")
  }

  /** Ordered pairs (a < b, guaranteed by the sorted input array) of a
    * sorted distinct array — `[x1..xn]` → `[(x1,x2),(x1,x3),…]`. */
  private def pairsOf(sorted: Column): Column =
    flatten(
      transform(
        sorted,
        (a, i) =>
          transform(
            slice(sorted, i + 2, size(sorted)),
            b => struct(a.as("a"), b.as("b")))))

  /** Link each distinct probe string to its BEST dictionary match
    * within `maxDist`: minimum distance, ties broken by the bytewise
    * smallest dictionary string. Probes with no match within range are
    * dropped (inner semantics — the unmatched set is the complement).
    * Output: `(probe, match, dist)` over distinct probe values.
    *
    * Same candidate plumbing as [[editDistancePairs]] but asymmetric:
    * both sides explode their deletion variants and meet in ONE
    * equi-join on the variant (dictionary side build, probe side
    * stream); the per-probe argmin is a bounded aggregate over the
    * verified candidates, not a window over the corpus. */
  def linkToDictionary(
      probe: DataFrame,
      probeCol: String,
      dict: DataFrame,
      dictCol: String,
      maxDist: Int
  ): DataFrame = {
    val p = probe
      .select(col(probeCol).as("probe"))
      .where(col("probe").isNotNull && length(col("probe")) > 0)
      .distinct()
      .select(col("probe"), explode(deletionVariants(col("probe"), maxDist)).as("__v"))
    val d = dict
      .select(col(dictCol).as("match"))
      .where(col("match").isNotNull && length(col("match")) > 0)
      .distinct()
      .select(col("match"), explode(deletionVariants(col("match"), maxDist)).as("__v"))
    val cand = p
      .join(d, Seq("__v"))
      .select("probe", "match")
      .distinct()
      .withColumn("dist", levenshtein(col("probe"), col("match")))
      .where(col("dist") <= maxDist)
    cand
      .groupBy("probe")
      .agg(min(struct(col("dist"), col("match"))).as("__best"))
      .select(
        col("probe"),
        col("__best.match").as("match"),
        col("__best.dist").as("dist"))
  }
}
