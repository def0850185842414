package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Incremental MinHash-LSH deduplication: screen an INGEST BATCH against
  * a PERSISTED corpus band index without re-reading the corpus text.
  *
  * The batch form ([[DedupDocs.minhashLshPairs]]) re-shingles the whole
  * corpus per run — fine for a one-shot dedup, intractable as a daily
  * job at 100 TB. What scales is the classic index split:
  *
  *  - the corpus is represented ONLY by its band-key index
  *    ([[DedupDocs.bandKeys]]: `numHashes/rowsPerBand` small rows per
  *    doc — a ~100-byte row vs the document payload), written once and
  *    APPENDED with each admitted batch's keys;
  *  - each new batch (small by contract — an ingest slice, not a
  *    corpus) is screened with the NEW side broadcast, so the index
  *    side streams through a broadcast-hash join once and NEVER
  *    shuffles, whatever its size. No sort, no exchange on the 100 TB
  *    side; the only shuffles in the plan touch batch-sized data.
  *
  * Decision semantics (and the [[graft.SparkEntry]] q_dedup_incremental
  * oracle): a new doc is `dup_of_corpus` if it shares ANY band bucket
  * with a corpus doc, and `dup_within_new` if it shares a bucket with a
  * SMALLER-id doc of the same batch (greedy bucket-local keep-first —
  * the same min-id tie-break as exact keep-first dedup, U2). Admission
  * = both flags 0. [[screenVerified]] tightens the candidate-as-decision
  * contract: the index carries each doc's signature
  * ([[buildIndexWithSignatures]]) and a collision only flags when the
  * pair's ESTIMATED JACCARD clears a threshold. The new batch's signature subtree is deliberately
  * consumed by both checks without a persist: recomputing it is O(batch)
  * kernel work, while a cache dependency would pin executor memory for
  * no corpus-side gain (the known double-consumption trade, decided the
  * cheap direction here).
  */
object IncrementalDedup {

  /** The persisted index of a corpus (or of an admitted batch, for the
    * append): one `(doc_id, band, band_key)` row per band per doc. At
    * scale, write it partitioned however the store likes — the screen
    * join needs no particular layout because the index side never
    * shuffles. */
  def buildIndex(corpus: DataFrame, k: Int, numHashes: Int, rowsPerBand: Int): DataFrame =
    DedupDocs.bandKeys(corpus, k, numHashes, rowsPerBand)

  /** Screening decisions, one row per new doc:
    * `(doc_id, dup_of_corpus, dup_within_new)` with 0/1 int flags.
    * Docs with < k tokens have no shingles, collide with nothing, and
    * come out (0, 0) — same as the batch LSH treating them as unique. */
  def screen(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val nb = DedupDocs.bandKeys(newDocs, k, numHashes, rowsPerBand)

    // vs corpus: inner-join the index against the BROADCAST batch keys,
    // keep the distinct batch doc_ids that hit. A semi-join would point
    // the broadcast at the wrong (index) side; this way the corpus index
    // is the streamed probe side of a broadcast-hash join.
    val corpusHits = corpusIndex
      .select(col("band"), col("band_key"))
      .join(broadcast(nb), Seq("band", "band_key"))
      .select(col("doc_id"))
      .distinct()
      .withColumn("__vs_corpus", lit(1))

    // within-new: min doc_id per bucket over the batch's own keys — one
    // batch-sized shuffle
    val minW = Window.partitionBy(col("band"), col("band_key"))
    val newHits = nb
      .withColumn("__min_id", min(col("doc_id")).over(minW))
      .where(col("doc_id") > col("__min_id"))
      .select(col("doc_id"))
      .distinct()
      .withColumn("__vs_new", lit(1))

    // both hit sets are ⊆ batch doc_ids — broadcast them so the decision
    // assembly adds no shuffle beyond the batch window above
    newDocs
      .select(col("doc_id"))
      .join(broadcast(corpusHits), Seq("doc_id"), "left")
      .join(broadcast(newHits), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("__vs_corpus"), lit(0)).as("dup_of_corpus"),
        coalesce(col("__vs_new"), lit(0)).as("dup_within_new")
      )
  }

  /** [[buildIndex]] with the minhash signature carried on every band row
    * (`sig`: numHashes longs/doc-band — still ~100 bytes vs the payload).
    * The schema [[screenVerified]] expects; [[screen]] also accepts it
    * (the extra column is pruned). */
  def buildIndexWithSignatures(
      corpus: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame =
    DedupDocs.bandKeysWithSig(corpus, k, numHashes, rowsPerBand)

  /** [[screen]] with signature verification: a band collision is only a
    * CANDIDATE; the flag is set when the pair's estimated Jaccard —
    * matching signature components / numHashes — clears `minJaccard`.
    * At rowsPerBand=4 a lone 4-hash collision is a noisy verdict (the
    * batch pipeline's downstream clustering absorbs those; a screen's
    * admit decision has no downstream) — verification is the precision
    * knob. `minJaccard ≤ rowsPerBand/numHashes` degenerates to [[screen]]
    * (any collision already matches a full band).
    *
    * Same join shape as [[screen]]: the corpus index streams through a
    * broadcast-hash join against the batch and never shuffles; the
    * signature check is a per-candidate projection (zip_with/aggregate
    * over two in-row arrays), so verification adds NO exchange — the
    * index rows are ~(1 + numHashes·8/100)× wider, the plan is the same.
    * `dup_within_new` verifies pairwise against every smaller-id
    * collision partner (not just the bucket min), the verified analog of
    * greedy keep-first. Threshold compare is on integer match COUNTS
    * (`ceil(minJaccard · numHashes)`), so the oracle's SUM/16.0 form
    * cannot float-diverge.
    */
  def screenVerified(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int,
      minJaccard: Double
  ): DataFrame = {
    val minMatches = math.ceil(minJaccard * numHashes).toInt
    val nb = DedupDocs.bandKeysWithSig(newDocs, k, numHashes, rowsPerBand)
    def sigMatches(a: Column, b: Column): Column =
      aggregate(
        zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0),
        (acc, v) => acc + v
      )

    val corpusHits = corpusIndex
      .select(col("band"), col("band_key"), col("sig").as("__csig"))
      .join(
        broadcast(nb.select(col("doc_id"), col("band"), col("band_key"), col("sig"))),
        Seq("band", "band_key"))
      .where(sigMatches(col("__csig"), col("sig")) >= minMatches)
      .select(col("doc_id"))
      .distinct()
      .withColumn("__vs_corpus", lit(1))

    // within-new: pairwise against smaller-id collision partners — a
    // batch-sized broadcast self-join on the bucket key (the signature
    // subtree recomputes per side: O(batch) kernel work, the same
    // documented trade as screen's two consumers)
    val newHits = nb
      .select(col("doc_id").as("__a_id"), col("band"), col("band_key"), col("sig").as("__asig"))
      .join(broadcast(nb.select(col("doc_id"), col("band"), col("band_key"), col("sig"))),
        Seq("band", "band_key"))
      .where(col("__a_id") < col("doc_id") &&
        sigMatches(col("__asig"), col("sig")) >= minMatches)
      .select(col("doc_id"))
      .distinct()
      .withColumn("__vs_new", lit(1))

    newDocs
      .select(col("doc_id"))
      .join(broadcast(corpusHits), Seq("doc_id"), "left")
      .join(broadcast(newHits), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("__vs_corpus"), lit(0)).as("dup_of_corpus"),
        coalesce(col("__vs_new"), lit(0)).as("dup_within_new")
      )
  }

  /** The admitted slice of the batch, full columns — what gets appended
    * to the corpus (and whose [[buildIndex]] rows get appended to the
    * index). */
  def admit(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame =
    newDocs.join(
      screen(newDocs, corpusIndex, k, numHashes, rowsPerBand)
        .where(col("dup_of_corpus") === 0 && col("dup_within_new") === 0)
        .select("doc_id"),
      Seq("doc_id")
    )
}
