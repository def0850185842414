package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for a training-data pipeline: flag corpus
  * documents that share word k-shingles with a benchmark/eval set, so
  * eval content doesn't leak into training data.
  *
  * Physical plan (the 100 TB shape): the benchmark side is tiny relative
  * to the corpus (eval suites are ~1e4–1e6 docs), so its distinct-shingle
  * set is BROADCAST and the corpus stream is never shuffled for the
  * match: corpus shingles explode in place ([[DedupDocs.shingles]] —
  * ShingleArray dedupes per doc in-kernel), a broadcast-hash LEFT SEMI
  * join keeps matching shingles only, and ONE aggregation produces the
  * per-doc overlap counts. A document's shingles never span partitions
  * (explode doesn't split a row), so map-side partial aggregation
  * collapses each doc to a single row before the exchange — the shuffle
  * is O(docs with ≥1 match), and zero-overlap documents (the vast
  * majority at scale) never enter it at all.
  *
  * The `*Against` forms take corpus and benchmark as separate frames
  * (the deployment shape — eval suites live in their own table); the
  * `isBench`-predicate forms carve both out of one frame.
  */
object Decontaminate {

  /** Per-corpus-document count of DISTINCT word k-shingles shared with
    * the benchmark frame. Documents with zero overlap are omitted — at
    * scale that is almost everyone, and emitting them would turn the
    * O(matches) aggregate into an O(corpus) join. */
  def overlapCountsAgainst(corpus: DataFrame, bench: DataFrame, k: Int): DataFrame = {
    val benchShingles = DedupDocs.shingles(bench, k).select("shingle").distinct()
    // COUNT-GATED broadcast, not forced ([[graft.spikes.Spikes
    // .broadcastIfSmall]] — same guard as the patch-gather join): an
    // oversized benchmark side degrades to a shuffled semi-join instead
    // of OOMing the driver. The exact distinct-shingle count costs one
    // extra aggregate over the bench slice — by assumption the small
    // side, and when it isn't, the fallback it buys is exactly what's
    // needed.
    val gated =
      graft.spikes.Spikes.broadcastIfSmall(benchShingles, benchShingles.count())
    // shingles are distinct per doc already, so count(*) IS the distinct
    // overlap count
    DedupDocs
      .shingles(corpus, k)
      .join(gated, Seq("shingle"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** [[overlapCountsAgainst]] with corpus/benchmark carved out of one
    * frame by the `isBench` predicate. */
  def overlapCounts(documents: DataFrame, isBench: Column, k: Int): DataFrame =
    overlapCountsAgainst(documents.where(!isBench), documents.where(isBench), k)

  /** [[overlapCounts]] plus the contamination verdict at `minOverlap`
    * distinct shared shingles (int 0/1 for engine/oracle portability). */
  def overlapFlags(documents: DataFrame, isBench: Column, k: Int, minOverlap: Int): DataFrame =
    overlapCounts(documents, isBench, k)
      .withColumn("contaminated", (col("n_overlap") >= minOverlap).cast("int"))

  /** The decontaminated corpus: `corpus` minus documents with at least
    * `minOverlap` distinct shingles shared with `bench`. The flagged id
    * set is small by construction (contamination is the exception), so
    * the anti-join broadcasts and the corpus is filtered without a
    * shuffle. */
  def cleanAgainst(corpus: DataFrame, bench: DataFrame, k: Int, minOverlap: Int): DataFrame = {
    val flagged = overlapCountsAgainst(corpus, bench, k)
      .where(col("n_overlap") >= minOverlap)
      .select("doc_id")
    corpus.join(broadcast(flagged), Seq("doc_id"), "left_anti")
  }

  /** [[cleanAgainst]] with corpus/benchmark carved out of one frame. */
  def clean(documents: DataFrame, isBench: Column, k: Int, minOverlap: Int): DataFrame =
    cleanAgainst(documents.where(!isBench), documents.where(isBench), k, minOverlap)
}
