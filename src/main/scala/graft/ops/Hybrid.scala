package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical ranking
  * ([[Bm25]]) and a dense ranking ([[Similarity]] / [[Ivf]] / [[Pq]]) —
  * the standard way a data pipeline combines keyword recall with
  * embedding recall (decontamination review, topical mining, RAG-style
  * retrieval over the corpus). RRF needs no score calibration between
  * the two systems — only ranks:
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60 by convention
  *
  * Scale shape: fusion runs over CANDIDATE LISTS (top-N per retriever),
  * never over corpora — the inputs are ≤ N rows each by construction,
  * so the full-outer join and the final top-k are O(N) no matter how
  * large the corpus behind each retriever is. The expensive work
  * (corpus scans, index probes) stays inside the retrievers, which keep
  * their own 100 TB shapes.
  */
object Hybrid {

  /** Decorate an ordered top-k frame with a 1-based `rank` column.
    * The window is keyless BY DESIGN BOUND: `df` must already be a
    * candidate list (≤ k rows, post-limit), so the single-partition
    * sort ranks k rows, not a corpus. */
  def withRank(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column], rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol, row_number().over(Window.orderBy(orderCols: _*)))

  /** Fuse two candidate lists `(doc_id, rank)` → top-`k` by RRF.
    * Output: (doc_id, lex_rank, dense_rank, rrf_score) with −1 sentinel
    * ranks for docs present in only one list; rrf is rounded to 6dp
    * BEFORE the final ranking so ties break identically in any engine
    * (then doc_id asc). For per-query fusion over a query batch, fuse
    * with `query_id` prepended to the join key and rank within
    * `Window.partitionBy("query_id")` — same O(N·|q|) bound.
    *
    * INPUT CONTRACT (ADVICE r18): `rank` must be an INTEGRAL 1-based
    * position (a row_number output — what [[withRank]] produces) and
    * each doc_id must appear at most once per list. The union+max plan
    * casts ranks to int and collapses per doc_id, so a fractional rank
    * would silently truncate and duplicate doc_ids would collapse to
    * one max-rank row where the old full-outer join emitted one row
    * per duplicate pair — violations are caller bugs, not supported
    * inputs. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // union + max-rollup instead of a FULL OUTER join: each doc_id
    // appears at most once per candidate list, so max() over the
    // null-padded union reconstructs exactly the outer join's row —
    // one map-side-combinable exchange and no sort, where the outer
    // join (which can never broadcast) planned SMJ with two
    // exchange+sorts (r18). Same rows, same values.
    val l = lex.select(col("doc_id"), col("rank").as("lex_rank"),
      lit(null).cast("int").as("dense_rank"))
    val d = dense.select(col("doc_id"), lit(null).cast("int").as("lex_rank"),
      col("rank").cast("int").as("dense_rank"))
    val contrib = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(c) + r).cast("double"), lit(0.0))
    l.select(col("doc_id"), col("lex_rank").cast("int").as("lex_rank"), col("dense_rank"))
      .unionAll(d)
      .groupBy("doc_id")
      .agg(max(col("lex_rank")).as("lex_rank"), max(col("dense_rank")).as("dense_rank"))
      .select(
        col("doc_id"),
        coalesce(col("lex_rank"), lit(-1)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(-1)).as("dense_rank"),
        round(contrib(col("lex_rank")) + contrib(col("dense_rank")), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }
}
