package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-LM quality scoring for a training-data pipeline: score every
  * document by its average token log-probability under an add-1-smoothed
  * unigram language model estimated from the corpus itself (the CCNet /
  * Wikipedia-LM filtering signal, reduced to the unigram case so a SQL
  * oracle can reproduce it exactly). Low-probability documents — rare
  * junk tokens, boilerplate the corpus doesn't otherwise contain — score
  * low and can be dropped by percentile.
  *
  * Physical plan (the 100 TB shape): the token stream is aggregated ONCE
  * into the vocabulary count table (map-side partial aggregation — the
  * exchange is O(vocab), not O(tokens)); that table is vocab-sized
  * (≤ a few million rows at web scale), so it is cached and COUNT-GATED
  * into a broadcast-hash join back onto the token stream
  * ([[graft.spikes.Spikes.broadcastIfSmall]] — an oversized vocabulary
  * degrades to a shuffled join instead of OOMing the driver). The
  * final per-doc aggregate again collapses map-side: a document's tokens
  * never span partitions, so the exchange is O(docs).
  */
object Lm {

  /** Corpus unigram counts over single-space tokenization: (tok, c). */
  def unigramCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("c"))

  /** Per-document average log-probability and perplexity under the
    * corpus's own add-1-smoothed unigram LM:
    * p(t) = (c_t + 1) / (N + V), with N total tokens, V vocabulary size.
    *
    * Output: (doc_id, n_tokens, avg_logprob, ppl), the log-prob averaged
    * per token and rounded to 4dp (oracle stability), ppl = exp(-avg)
    * from the unrounded average.
    *
    * The per-token term is spelled log((c+1)/(N+V)) — NOT the
    * algebraically equal log(c+1) − log(N+V) — so the floating-point
    * evaluation order matches the SQL oracle's term-by-term sum.
    */
  def lmScore(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val toks = documents.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // ONE corpus-scan aggregate, cached only long enough to decide the
    // join strategy: when the vocabulary fits the broadcast threshold
    // (the normal case — vocab grows sub-linearly in corpus size), the
    // counts are collected into a LocalRelation and the scoring join is
    // broadcast-hash with no second corpus scan. An oversized vocabulary
    // degrades to a shuffled join instead of OOMing the driver; there
    // the counts table is RECOMPUTED by the scoring join (one extra
    // token-stream pass, deterministic) rather than left pinned in
    // cache for the session lifetime. Either way the cache is released
    // before this method returns.
    val cnt = unigramCounts(documents).persist(StorageLevel.MEMORY_AND_DISK)
    val stats = cnt.agg(count(lit(1)).as("v"), sum(col("c")).as("n")).head()
    val vocab = stats.getLong(0)
    val perRowBytes = 80L // tok string + long count, UnsafeRow-ish
    val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
    val (cntSide, nTotal) =
      if (thr > 0 && vocab * perRowBytes <= thr) {
        val rows = cnt.collect()
        cnt.unpersist()
        val local = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
          cnt.schema
        )
        (broadcast(local), rows.iterator.map(_.getLong(1)).sum)
      } else {
        cnt.unpersist()
        (cnt, stats.getLong(1))
      }
    val denom = lit((nTotal + vocab).toDouble)
    val perTok = log((col("c").cast("double") + lit(1.0)) / denom)
    toks
      .join(cntSide, Seq("tok"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(perTok) / count(lit(1)), 4).as("avg_logprob"),
        round(exp(-sum(perTok) / count(lit(1))), 4).as("ppl")
      )
  }
}
