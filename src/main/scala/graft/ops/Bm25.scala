package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical top-k retrieval — the lexical counterpart of the
  * embedding ANN stack ([[Similarity]], [[Ivf]], [[Pq]]). A training-data
  * pipeline uses it to pull benchmark-adjacent documents for
  * decontamination review, to mine topical subsets, and as the sparse
  * side of hybrid retrieval. Okapi BM25 with the Lucene `+1` idf variant
  * (always positive, so adding a matched term never lowers the score):
  *
  *   idf(t)  = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)
  *   w(t, d) = idf(t) · tf · (k1+1) / (tf + k1 · (1 − b + b · dl/avgdl))
  *   score(d) = Σ_{t ∈ q ∩ d} w(t, d)
  *
  * Physical plan (the 100 TB shape): the query-term set is tiny, so it
  * is embedded as an `In` predicate and the token array is filtered
  * BEFORE exploding — the exploded stream is O(matched occurrences),
  * never O(corpus tokens). Per-(doc, term) tf collapses map-side
  * (exchange O(matched docs × |q|)); document frequencies are a second
  * |q|-row aggregate over the same pruned scan, collected to the driver
  * and folded into per-term idf CONSTANTS, so scoring is a pure
  * projection — no join at all. Top-k is `TakeOrderedAndProject`
  * (per-partition heaps + driver merge of k rows), never a full sort.
  * A serving deployment issuing many queries would maintain a
  * materialized postings/df table instead of re-scanning (the same
  * build/serve split [[Ivf.topKIndexed]] uses); this form is the
  * one-shot scan-time query.
  *
  * Ordering ties are broken by (rounded score desc, doc_id asc); the
  * score is rounded to 4dp BEFORE ranking so the SQL oracle's
  * independently-summed floats rank identically (see q_lm_score).
  */
object Bm25 {

  /** Top-`k` documents for `queryTerms` under BM25(k1, b) over
    * single-space tokenization. Output: (doc_id, n_terms, score) where
    * n_terms is the number of distinct query terms matched.
    */
  def topK(
      documents: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct

    // ONE column-pruned pass for the two corpus scalars (N, avgdl).
    val statsRow = documents
      .agg(count(lit(1)).as("n"), avg(size(split(col("text"), " "))).as("avgdl"))
      .head()
    val nDocs = statsRow.getLong(0)
    val avgdl = if (statsRow.isNullAt(1)) 1.0 else statsRow.getDouble(1)

    // Matched occurrences only: filter the token array before exploding.
    val toks = documents.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("double").as("dl"),
      explode(filter(split(col("text"), " "), t => t.isInCollection(terms))).as("tok")
    )

    // df per query term: ≤ |q| rows, collected and folded into idf
    // constants (far below the >10k embed-vs-broadcast line).
    val dfByTerm = toks
      .select(col("doc_id"), col("tok"))
      .distinct()
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val idfByTerm = dfByTerm.map { case (t, df) =>
      t -> math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }

    // Scoring: pure projection over the per-(doc, term) tf aggregate.
    val tf = toks.groupBy("doc_id", "dl", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val idf: Column = element_at(typedLit(idfByTerm), col("tok"))
    val w = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tf.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(w), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
