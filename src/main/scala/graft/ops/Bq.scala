package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary quantization (sign-bit codes) + Hamming shortlist + exact
  * rerank — the memory-bound ANN serving recipe (RaBitQ/BQ-style
  * pipelines; the 1-bit end of the SQ8/PQ spectrum already in [[Sq]]/
  * [[Pq]]): a dim-d f32 vector collapses to d sign bits (32× smaller
  * — 8 bytes per 64 dims vs 256), Hamming distance over the packed
  * words approximates angular distance (for mean-centered-ish
  * embeddings sign agreement tracks cosine), and only a small
  * R-shortlist per query ever touches the f32 vectors again.
  *
  * At 100 TB this is a COLUMN-PRUNING story as much as a compute one:
  * the candidate scan reads (vec_id, cell, code) — the code column is
  * 1/32 the width of the embedding column — and the exact rerank
  * re-joins the corpus by vec_id for just |q|·R rows, so the f32
  * column is read through a point-lookup join, never scanned.
  *
  * Everything is pure Column arithmetic (HOF fold for the pack,
  * xor + bit_count for Hamming — codegen'd, no UDF, and SQL-
  * respellable: the oracle replays the identical pack/distance/rank
  * chain). Candidate generation rides the [[Ivf]] cell machinery
  * (bucket equi-join, probed-cell static pruning) — no nested-loop
  * join anywhere; with `nProbe == nLists` and `hammingR` ≥ corpus the
  * output is EXACTLY the brute-force top-k, which is how the oracle
  * checks it. Recall at real (nProbe, R) settings is measured in
  * BqBench.
  */
object Bq {

  /** Sign bits per packed word. 32 (not 64): the MSB-first
    * `acc*2 + bit` fold peaks at 2³²−1 — far from LONG overflow, so
    * the pack is ANSI-mode-safe with no shift ops, and the identical
    * fold is expressible in the oracle engine. */
  val WordBits = 32

  /** Pack the sign bits of a float-array column into
    * `ceil(dim/32)` longs, MSB-first within each word
    * (`code[w] = Σ_j 2^(31−j) · [emb[32w+j] > 0]`). Components beyond
    * a short final word simply contribute fewer bits — both sides of
    * any Hamming comparison pack identically, so no padding is
    * needed. */
  def packSignBits(emb: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val nWords = (dim + WordBits - 1) / WordBits
    val words = (0 until nWords).map { w =>
      aggregate(
        sequence(lit(w * WordBits + 1), lit(math.min((w + 1) * WordBits, dim))),
        lit(0L),
        (acc, j) => acc * 2 + when(element_at(emb, j.cast("int")) > 0f, 1L).otherwise(0L))
    }
    array(words: _*)
  }

  /** The DuckDB spelling of [[packSignBits]] — kept beside the
    * implementation so oracle and engine cannot drift structurally. */
  def packSignBitsSql(emb: String, dim: Int): String = {
    val nWords = (dim + WordBits - 1) / WordBits
    val words = (0 until nWords).map { w =>
      val hi = math.min((w + 1) * WordBits, dim)
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(${w * WordBits + 1}, $hi), " +
        s"j -> CASE WHEN $emb[j] > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), (acc, b) -> acc * 2 + b)"
    }
    s"[${words.mkString(", ")}]"
  }

  /** Hamming distance between two packed code arrays:
    * Σ bit_count(xor) over aligned words. */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L),
      (acc, v) => acc + v)

  /** Top-k per query through the binary pipeline over a pre-built IVF
    * index (`assigned`/`centroids` from [[Ivf.assignCells]]):
    * probed-cell candidates → Hamming over packed codes → top-R
    * shortlist per query (ties by vec_id) → exact f32 cosine rerank of
    * the shortlist via a vec_id re-join against the corpus → top-k by
    * (cos_sim desc, vec_id asc). Output matches [[Ivf.topKIndexed]]'s
    * schema: (query_id, vec_id, cos_sim, rank). */
  def topKBinaryIndexed(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      nProbe: Int,
      hammingR: Int,
      pruneIndexScan: Boolean = true
  ): DataFrame = {
    require(hammingR >= k, s"hammingR ($hammingR) must be >= k ($k) — the rerank can only demote")
    val spark = assigned.sparkSession
    import spark.implicits._
    val probedRows = Ivf.rankCells(queries, centroids, nProbe)
    val probed = probedRows
      .toDF("query_id", "cell", "qe")
      .select(
        col("query_id"),
        Similarity.norm(col("qe")).as("qn"),
        packSignBits(col("qe"), dim).as("__qcode"),
        col("cell"))
    // the candidate scan never touches the f32 embedding column: only
    // (vec_id, cell, code) flow through the Hamming pass
    val codes = assigned.select(
      col("vec_id"), col("cell"), packSignBits(col("embedding"), dim).as("__code"))
    val indexSide =
      if (!pruneIndexScan) codes
      else codes.where(col("cell").isin(probedRows.map(_._2).distinct.sorted: _*))
    val cand = indexSide
      .join(broadcast(probed), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"), col("qn"),
        hamming(col("__code"), col("__qcode")).as("__ham"))
    val wh = Window.partitionBy("query_id").orderBy(col("__ham").asc, col("vec_id").asc)
    val shortlist = cand
      .withColumn("__hr", row_number().over(wh))
      .where(col("__hr") <= hammingR)
      .select("query_id", "vec_id", "qn", "__ham")
    // exact rerank: point-lookup joins for |q|·R rows — the only reads
    // of the f32 columns in the whole pipeline
    val qe = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qe"))
    val scored = shortlist
      .join(assigned.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(qe), "query_id")
      .select(
        col("query_id"),
        col("vec_id"),
        round(
          Similarity.dot(col("embedding"), col("__qe")) /
            (Similarity.norm(col("embedding")) * col("qn")),
          6).as("cos_sim"))
    Ivf.rankTopK(scored, k, Seq("query_id", "vec_id", "cos_sim", "rank"))
  }
}
