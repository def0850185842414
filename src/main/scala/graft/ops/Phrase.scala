package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact phrase search over whitespace-tokenized text — the retrieval
  * primitive BM25 ([[Bm25]]) can't express (bag-of-words scoring loses
  * adjacency). Two physical shapes, identical results (spec-pinned):
  *
  *  - [[phraseMatches]] — the BATCH/filter form: a pure higher-order-
  *    function expression chain over the token array (sequence →
  *    filter → element_at), all codegen'd, no UDF. Stateless
  *    projection: zero shuffle at any corpus scale, overlapping
  *    occurrences counted (token semantics, not non-overlapping
  *    substring replace).
  *  - [[positionalPostings]] + [[phraseSearchIndexed]] — the SERVING
  *    form: tokenize the corpus ONCE into (term, doc_id, pos) postings
  *    (persist/bucket them like [[Bm25.buildIndex]]), then a k-term
  *    phrase is k−1 self-equi-joins on (doc_id, pos+j) over
  *    term-filtered postings — the filter prunes the scan to the
  *    phrase's terms, so query cost scales with term selectivity, not
  *    corpus size, and the corpus is never re-tokenized per query.
  */
object Phrase {

  /** Match starts of `phrase` per document: (doc_id, n_hits,
    * first_pos), 0-based token positions, only matching docs emitted.
    * Overlaps count ("a a a" has 2 hits of "a a"). */
  def phraseMatches(documents: DataFrame, phrase: String, textCol: String = "text"): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty phrase")
    // native one-pass kernel (r19): the previous HOF chain
    // (filter(sequence) over element_at probes) is interpreted, not
    // codegen'd, and this operator is a zero-exchange stateless
    // projection — the per-row chain WAS the query (guide §4; same
    // argument as DotF32/TokenSetCounts). Tokenization and the
    // integer outputs are identical; PhraseSpec pins batch == indexed.
    val h = graft.functions.PhraseHits.phraseHits(col(textCol), terms)
    documents
      .select(
        col("doc_id"),
        h.getField("n_hits").as("n_hits"),
        h.getField("first_pos").as("first_pos"))
      .where(col("n_hits") > 0)
  }

  /** (term, doc_id, pos) positional postings — build once, reuse per
    * query. One explode; callers persist or bucket-write by term for
    * serving (the [[Bm25.buildIndex]] lifecycle). */
  def positionalPostings(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(
      col("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))

  /** Phrase query against prebuilt postings: k−1 joins on
    * (doc_id, pos + j), each side pre-filtered to one term. Same output
    * contract as [[phraseMatches]]. */
  def phraseSearchIndexed(postings: DataFrame, phrase: String): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty phrase")
    val starts = terms.zipWithIndex.map { case (t, j) =>
      postings
        .where(col("term") === t)
        .select(col("doc_id"), (col("pos") - j).as("start"))
    }.reduce { (a, b) => a.join(b, Seq("doc_id", "start")) }
    starts
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_hits"),
        min(col("start")).cast("int").as("first_pos"))
  }
}
