package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ts.GlobalSort

/** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the blocking
  * family member the hash-bucket schemes can't replace: MinHash/LSH
  * buckets on CONTENT overlap, the fuzzy join on edit-distance
  * neighborhoods of short keys; SNM instead sorts the corpus by a
  * domain sort key (normalized title, name+zip, canonical URL) and
  * compares each record only against its `window − 1` successors in
  * the total order, so match quality is whatever the sort key's
  * locality gives and the candidate count is EXACTLY n·(window−1) —
  * data-independent, no hot bucket to shed, the property none of the
  * hash families can promise on adversarial keys.
  *
  * Execution shape (the 100 TB contract): the global sort rank comes
  * from [[GlobalSort.rankByValueBuckets]]'s two-pass value-bucket
  * recipe — buckets split on a 56-bit BYTE PREFIX of the key (a
  * monotone, non-strict function of the key's bytewise order, so
  * buckets respect the total order and equal prefixes always share a
  * bucket), no single-task global window. The windowed compare is an
  * explode of `window − 1` rank offsets + ONE equi-join on rank —
  * shuffle keyed by the dense rank, perfectly balanced by
  * construction. Rank is a pure function of the data (ties broken by
  * (key, id)), so the whole pipeline is oracle-replayable.
  */
object Snm {

  /** 56-bit byte-prefix of `key` as a long: the first 7 bytes of the
    * UTF-8 encoding, zero-padded — monotone (non-strict) with the
    * key's bytewise order, which is exactly what a value-split bucket
    * function must be. 7 bytes keeps the value positive in a signed
    * long. */
  private[graft] def bytePrefix56(key: Column): Column =
    conv(hex(substring(rpad(key, 7, "\u0000").cast("binary"), 1, 7)), 16, 10).cast("long")

  /** All candidate pairs within `window` positions of the (keyCol,
    * idCol) total order: (id_a, key_a, id_b, key_b, rank_gap) with
    * rank_a < rank_b. Every record meets exactly its window−1
    * successors (fewer at the corpus tail). */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = GlobalSort
      .rankByValueBuckets(
        df.select(col(idCol), col(keyCol))
          .where(col(keyCol).isNotNull)
          .withColumn("__kn", bytePrefix56(col(keyCol))),
        "__kn",
        Seq(keyCol, idCol))
      .drop("__kn")
    val probes = ranked
      .select(
        col(idCol).as("id_a"),
        col(keyCol).as("key_a"),
        col("rank").as("__ra"),
        explode(sequence(lit(1L), lit((window - 1).toLong))).as("__j"))
      .select(
        col("id_a"), col("key_a"), col("__ra"),
        (col("__ra") + col("__j")).as("rank"))
    probes
      .join(
        ranked.select(col(idCol).as("id_b"), col(keyCol).as("key_b"), col("rank")),
        Seq("rank"))
      .select(
        col("id_a"), col("key_a"), col("id_b"), col("key_b"),
        (col("rank") - col("__ra")).as("rank_gap"))
  }

  /** SNM match pairs: [[candidatePairs]] verified by key edit
    * distance — (id_a, id_b, dist) for pairs with
    * `levenshtein(key_a, key_b) <= maxDist`. The verify predicate runs
    * on exactly n·(window−1) candidates regardless of key skew. */
  def matchPairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int,
      maxDist: Int
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    candidatePairs(df, idCol, keyCol, window)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
