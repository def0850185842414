package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CappedStringSet.cappedStringSet

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
  * `levenshtein` before emission. One exchange keyed on the variant
  * string, quadratic only within a variant bucket.
  *
  * '''Hot-bucket shed.''' A variant bucket's pair cost is quadratic in
  * its member count, and degenerate key sets concentrate: every string
  * of length ≤ d collapses into the empty-string variant, and very
  * short keys share dense neighborhoods generally. Both operators
  * therefore bound every bucket with the saturating capped-set kernel
  * ([[graft.functions.CappedStringSet]], the
  * [[graft.ops.Text.winnowOverlapPairs]] recipe): a bucket that
  * exceeds `maxBucket` distinct members saturates map-side (O(1)
  * memory, members never shuffled) and is DROPPED — output stays
  * exact for every pair that shares at least one in-cap variant, and
  * a mega-bucket can no longer pin one task with an unbounded
  * quadratic explode. Pairs whose ONLY shared variant is over-cap are
  * shed with it; [[variantShed]] is the companion diagnostic that
  * counts exactly what was dropped (run it when shed volume matters —
  * the bench records it).
  *
  * '''Exclusions (by construction).''' NULL and empty-string keys are
  * dropped before candidate generation, so pairs involving `""` (e.g.
  * `("", "a")` at distance 1) are never emitted — callers that need
  * the empty key must handle it as a trivial special case (everything
  * of length ≤ d matches it).
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

  /** Default distinct-member cap per deletion-variant bucket. Pair
    * cost within a bucket is ≤ cap², and real near-duplicate mass
    * (typos of one name) is tens, not thousands — 1024 is far above
    * signal and far below the degenerate concentrations the shed
    * exists to stop. */
  val DefaultMaxBucket = 1024

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

  /** Distinct non-empty values of `strCol`, exploded to their
    * deletion variants: `(__s, __v)`. */
  private def explodedVariants(df: DataFrame, strCol: String, maxDist: Int): DataFrame =
    df.select(col(strCol).as("__s"))
      .where(col("__s").isNotNull && length(col("__s")) > 0)
      .distinct()
      .select(col("__s"), explode(deletionVariants(col("__s"), maxDist)).as("__v"))

  /** Pairs of DISTINCT values of `strCol` within Levenshtein distance
    * `maxDist` (1 ≤ dist ≤ maxDist; identical strings are one distinct
    * value and never pair with themselves). Output:
    * `(str_a, str_b, dist)` with `str_a < str_b` bytewise. Buckets
    * over `maxBucket` distinct members are shed (see class doc); with
    * the default cap the output is exact on any corpus whose variant
    * buckets stay in-cap.
    *
    * Plan: distinct strings → deletion-variant explode (stateless) →
    * ONE exchange into saturating capped-set buckets → within-bucket
    * sorted pair explode → pair distinct → levenshtein verify. The
    * verify runs on candidate pairs only (each pair once, not once per
    * shared variant). */
  def editDistancePairs(
      df: DataFrame,
      strCol: String,
      maxDist: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val vars = explodedVariants(df, strCol, maxDist)
    val buckets = vars
      .groupBy("__v")
      .agg(cappedStringSet(col("__s"), maxBucket).as("__ss"))
      .where(col("__ss").isNotNull && size(col("__ss")) > 1)
    // posexplode+slice pair explode (the shared DedupDocs shape): O(m)
    // incremental state per output row — the HOF transform/flatten
    // respelling materializes the full O(m²) pair array per bucket row
    // before exploding, a real memory spike at the bucket cap
    val pairs = DedupDocs
      .explodePairs(buckets.select(col("__ss").as("docs")))
      .select(col("doc_a").as("str_a"), col("doc_b").as("str_b"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .where(col("dist") <= maxDist)
      .select("str_a", "str_b", "dist")
  }

  /** Shed diagnostic for [[editDistancePairs]]: the variant keys whose
    * bucket exceeded `maxBucket` distinct members, with their TRUE
    * member counts — i.e. exactly the buckets the capped form drops.
    * This is a count-only aggregate (map-side combinable, no member
    * lists), so it is safe to run at any scale; empty result ⇒ the
    * capped output was exact. */
  def variantShed(
      df: DataFrame,
      strCol: String,
      maxDist: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame =
    explodedVariants(df, strCol, maxDist)
      .groupBy(col("__v").as("variant"))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucket)

  /** Link each distinct probe string to its BEST dictionary match
    * within `maxDist`: minimum distance, ties broken by the bytewise
    * smallest dictionary string. Probes with no match within range are
    * dropped (inner semantics — the unmatched set is the complement).
    * Output: `(probe, match, dist)` over distinct probe values.
    *
    * Same candidate plumbing as [[editDistancePairs]] but asymmetric:
    * the dictionary side collapses into capped variant buckets (ONE
    * aggregate exchange; over-cap variants saturate map-side and are
    * shed — a probe reaches a dictionary word through any of their
    * shared in-cap variants), the probe side explodes its variants and
    * meets the buckets in ONE equi-join on the variant. Per
    * probe-variant row the join emits at most one bucket of ≤
    * `maxBucket` members, so candidate volume is ≤ probes × L^d ×
    * maxBucket — linear in probes, never quadratic. The per-probe
    * argmin is a bounded aggregate over the verified candidates, not a
    * window over the corpus. */
  def linkToDictionary(
      probe: DataFrame,
      probeCol: String,
      dict: DataFrame,
      dictCol: String,
      maxDist: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val p = probe
      .select(col(probeCol).as("probe"))
      .where(col("probe").isNotNull && length(col("probe")) > 0)
      .distinct()
      .select(col("probe"), explode(deletionVariants(col("probe"), maxDist)).as("__v"))
    val d = dict
      .select(col(dictCol).as("__m"))
      .where(col("__m").isNotNull && length(col("__m")) > 0)
      .distinct()
      .select(col("__m"), explode(deletionVariants(col("__m"), maxDist)).as("__v"))
      .groupBy("__v")
      .agg(cappedStringSet(col("__m"), maxBucket).as("__ms"))
      .where(col("__ms").isNotNull)
    val cand = p
      .join(d, Seq("__v"))
      .select(col("probe"), explode(col("__ms")).as("match"))
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
