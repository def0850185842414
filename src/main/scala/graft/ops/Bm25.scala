package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
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
  * A serving deployment issuing many queries maintains a materialized
  * postings/df index instead of re-scanning — [[buildIndex]] /
  * [[topKIndexed]], the same build/serve split [[Ivf.topKIndexed]]
  * uses; [[topK]] is the one-shot scan-time query.
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

  /** Driver-side twin of Spark's `hash(tok)` (Murmur3, seed 42),
    * evaluated through the SAME Catalyst expression so build-side
    * bucketing and probe-side pruning can never disagree. */
  private[ops] def termBucket(term: String, nBuckets: Int): Int = {
    val h = Murmur3Hash(Seq(Literal(term)), 42).eval(null).asInstanceOf[Int]
    java.lang.Math.floorMod(h, nBuckets)
  }

  /** Materialize the serving index under `path`: the build/serve split
    * [[topK]]'s scaladoc promises, mirroring [[Ivf.assignCells]] →
    * `partitionBy("cell")`. One tokenize pass produces three tables:
    *
    *   - `postings` — (tok, doc_id, tf, dl), `partitionBy("bucket")`
    *     where bucket = pmod(hash(tok), nBuckets). A probe's terms map
    *     to ≤ |q| buckets DRIVER-SIDE ([[termBucket]]), so the static
    *     `bucket IN (...)` filter partition-prunes at planning time —
    *     only the probed buckets' files are listed and read, the
    *     O(|q|/nBuckets)-I/O layout a 100 TB postings table wants. The
    *     pushed `tok IN (...)` predicate then prunes row groups inside
    *     the surviving files (tok is in the sort key within a bucket).
    *   - `df` — (tok, df) per distinct token, bucket-partitioned the
    *     same way: the probe's ≤ |q|-row idf lookup prunes identically.
    *   - `stats` — one row (n_docs, avgdl): the corpus scalars, so
    *     serving never touches the corpus.
    *
    * Index size is O(distinct (doc, term) pairs) — the classic inverted
    * index without positions. Build is one shuffle (the tf groupBy);
    * df derives from postings map-side (distinct doc-per-tok ==
    * postings row count per tok, no second corpus pass).
    */
  def buildIndex(documents: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    // ONE postings exchange and ZERO aggregate stages (was: explode all
    // occurrences → tf groupBy exchange → repartition-by-bucket
    // exchange). Term frequency is a PER-DOCUMENT quantity, so the
    // [[graft.functions.TokenTfPairs]] kernel computes it before
    // anything moves: the exchange carries one COMPLETE row per
    // distinct (doc, term) — strictly fewer rows than the occurrence
    // stream, already combined, nothing to aggregate shuffle-side
    // (Bm25Bench r11 A/B). The 2×nBuckets slot count keeps
    // hash(bucket)→slot collisions from halving write parallelism when
    // nBuckets ≈ shuffle partitions.
    val bucketed = documents
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("dl"),
        explode(graft.functions.TokenTfPairs.tokenTfPairs(col("text"))).as("p"))
      .select(
        col("doc_id"), col("dl"), col("p.tok").as("tok"),
        col("p.tf").cast("double").as("tf"),
        pmod(hash(col("p.tok")), lit(nBuckets)).as("bucket"))
      .repartition(2 * nBuckets, col("bucket"))
    bucketed
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    // one postings row per distinct (doc, tok) ⇒ df = COUNT(*) per tok;
    // a (bucket, tok)-column re-read of the written postings is cheaper
    // than persisting the full frame across both writes (measured)
    documents.sparkSession.read
      .parquet(s"$path/postings")
      .groupBy("bucket", "tok")
      .agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/df")
    documents
      .agg(
        count(lit(1)).as("n_docs"),
        avg(size(split(col("text"), " "))).as("avgdl"),
        // recorded so the probe can never bucket with a different n
        lit(nBuckets).as("n_buckets")
      )
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Top-`k` over a [[buildIndex]] postings index: the steady-state
    * serving probe. Touches ONLY the query terms' buckets (static
    * partition-pruning filter computed driver-side — no corpus scan, no
    * tokenize): a ≤ |q|-row df read folded into idf constants, then the
    * postings scan → pure-projection scoring → TakeOrderedAndProject,
    * the same no-join plan as [[topK]]. Results are identical to
    * [[topK]] with the same parameters (spec-pinned).
    */
  def topKIndexed(
      spark: SparkSession,
      indexPath: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct

    val statsRow = spark.read.parquet(s"$indexPath/stats").head()
    val nDocs = statsRow.getAs[Long]("n_docs")
    val avgdl = Option(statsRow.getAs[java.lang.Double]("avgdl")).fold(1.0)(_.doubleValue)
    val nBuckets = statsRow.getAs[Int]("n_buckets")
    val buckets = terms.map(termBucket(_, nBuckets)).distinct

    val idfByTerm = spark.read
      .parquet(s"$indexPath/df")
      .where(col("bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
      .select(col("tok"), col("df"))
      .collect()
      .map(r => r.getString(0) -> math.log((nDocs - r.getLong(1) + 0.5) / (r.getLong(1) + 0.5) + 1.0))
      .toMap
    if (idfByTerm.isEmpty) {
      // no query term exists in the corpus — empty result, stable schema
      return spark.read.parquet(s"$indexPath/postings")
        .select(col("doc_id"), lit(0L).as("n_terms"), lit(0.0).as("score"))
        .where(lit(false))
    }

    val tf = spark.read
      .parquet(s"$indexPath/postings")
      .where(col("bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
    val idf: Column = element_at(typedLit(idfByTerm), col("tok"))
    val w = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tf.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(w), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
