package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication over an embedding column: the
  * cluster-then-compare recipe of Abbas et al. 2023 ("SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540). K-means partitions the corpus into `nLists`
  * cells (the same deterministic trainer the IVF index uses —
  * [[Ivf.trainCentroids]] / [[graft.functions.ArgminCell]]), and the
  * quadratic pairwise-cosine comparison runs only WITHIN a cell.
  *
  * Why this is the embedding-dedup scale path: global pairwise cosine
  * is O(n²) and un-shardable, while cluster-scoped comparison is an
  * equi-join on `cell` — one shuffle on a small key, with the pair
  * count bounded by Σ|cell|² instead of n². At 100 TB, `nLists` grows
  * with the corpus (the paper uses tens of thousands of clusters) so
  * the per-cell quadratic term stays constant; the cell join parallels
  * perfectly across executors and no global pair set ever
  * materializes. The cross-cell misses this admits are the documented
  * recall trade of the method (near-dups straddling a Voronoi border),
  * exactly as in the paper.
  *
  * Retention rule: within a cell, a row is a duplicate iff some row
  * with a SMALLER `vec_id` lies within `minCosine` of it; `dup_of`
  * reports the smallest such neighbor. Keep-lowest-id is deterministic
  * under retries and repartitioning and is what the SQL oracle spells.
  * (The paper keeps the member with the lowest similarity to the cell
  * centroid — a tuning choice on WHICH representative survives, not on
  * what counts as a duplicate; id-order retention makes the operator's
  * output a pure function of the corpus.)
  *
  * Cosine is rounded to 6dp BEFORE the threshold comparison, and norms
  * are computed once per row (not per pair), exactly like
  * [[Similarity.bruteForceTopK]].
  */
object SemDedup {

  /** Train + assign + dedup in one call. A real corpus trains/assigns
    * once ([[Ivf.assignCells]], persisted) and runs [[semDedupAssigned]]
    * on the stored assignment — the shape [[Ivf.topKIndexed]] documents.
    * Returns (result, centroids) so callers (and the generated oracle)
    * can reproduce the assignment. */
  def semDedup(
      corpus: DataFrame,
      nLists: Int,
      minCosine: Double,
      sampleSize: Int = 100000
  ): (DataFrame, Array[Array[Double]]) = {
    val centroids = Ivf.trainCentroids(corpus, nLists, sampleSize)
    val assigned = corpus.withColumn(
      "cell",
      graft.functions.ArgminCell.argminCell(col("embedding"), centroids))
    (semDedupAssigned(assigned, minCosine), centroids)
  }

  /** The dedup verdict over a pre-assigned corpus (`vec_id`,
    * `embedding`, `cell`). Output: (vec_id, cell, is_dup, dup_of) —
    * `is_dup` 1 iff a smaller-id neighbor in the same cell has cosine
    * ≥ `minCosine` (6dp-rounded), `dup_of` the smallest such id (NULL
    * sentinel -1 for keepers, so the int column survives the oracle's
    * pandas-shaped compare).
    *
    * EXACT-COLLAPSE pre-pass (the duplicate-heavy-corpus guard): rows
    * with byte-identical embeddings collapse to one representative per
    * (cell, vector) BEFORE the pairwise stage, so the quadratic term is
    * Σ|distinct(cell)|², not Σ|cell|² — a corpus that is 99 % exact
    * copies (the post-crawl, pre-exact-dedup shape; measured 893 s →
    * seconds at the 100×-duplicated bench row) costs the same as its
    * distinct core. PROVABLY output-identical to the all-pairs form
    * ([[semDedupAssignedAllPairs]], spec-pinned): the smallest
    * qualifying neighbor of a row is either the min id of a qualifying
    * OTHER vector group (every copy of a group qualifies iff its vector
    * does) or the min id of its OWN group (copies are mutual neighbors
    * iff round(cos(v,v)) ≥ threshold). Zero-norm vectors are an ANSI
    * divide-by-zero error in both forms — filter them upstream. */
  def semDedupAssigned(assigned: DataFrame, minCosine: Double = MinCosineDefault): DataFrame = {
    val rows = assigned.select(col("vec_id"), col("embedding"), col("cell"))
    val reps = rows
      .groupBy(col("cell"), col("embedding"))
      .agg(min("vec_id").as("rep_id"))
      .withColumn("__nrm", Similarity.norm(col("embedding")))
      .withColumn(
        "__self",
        round(
          Similarity.dot(col("embedding"), col("embedding")) / (col("__nrm") * col("__nrm")),
          6))
    val mOther = reps
      .as("a")
      .join(
        reps.as("b"),
        col("a.cell") === col("b.cell") && col("a.rep_id") =!= col("b.rep_id"))
      .select(
        col("a.cell").as("cell"),
        col("a.rep_id").as("rep_id"),
        col("b.rep_id").as("nbr"),
        round(
          Similarity.dot(col("a.embedding"), col("b.embedding")) /
            (col("a.__nrm") * col("b.__nrm")),
          6
        ).as("cos_sim")
      )
      .where(col("cos_sim") >= minCosine)
      .groupBy("cell", "rep_id")
      .agg(min("nbr").as("__m_other"))
    // NULL-SAFE join back: a plain equi-join would silently DROP rows
    // with a NULL embedding or cell, while the all-pairs form emits
    // them as keepers (their cosines are NULL → never qualify). <=>
    // matches the null groups groupBy already created.
    val repSide = reps.select(
      col("cell").as("__rc"), col("embedding").as("__re"),
      col("rep_id"), col("__self"))
    // limit-probe small-side recipe on the qualifying-neighbor rollup
    // (r19, guide §3.1): mOther is O(reps with a qualifying neighbor) —
    // communities-bounded in practice but stats-less (it hangs off the
    // quadratic pair join), so the un-hinted left join planned
    // sort-merge with two exchange+sorts (r18/r19 plan audit). Within
    // the cap the probe's single execution becomes a broadcast
    // LocalRelation (the pair join also stops re-running inside the
    // final plan); past the cap it degrades to a tracked persisted
    // frame and the join falls back to the shuffle lane — the
    // corpus-sized contract is unchanged.
    val mOtherSide = graft.util.DriverSide.smallSideOrTracked(mOther)
    rows
      .join(repSide,
        col("cell") <=> col("__rc") && col("embedding") <=> col("__re"))
      .drop("__rc", "__re")
      .join(mOtherSide, Seq("cell", "rep_id"), "left")
      .withColumn(
        "__c_same",
        when(col("__self") >= minCosine && col("vec_id") > col("rep_id"), col("rep_id")))
      .withColumn(
        "__c_other",
        when(col("__m_other") < col("vec_id"), col("__m_other")))
      .withColumn("__dup", least(col("__c_same"), col("__c_other")))
      .select(
        col("vec_id"),
        col("cell"),
        when(col("__dup").isNotNull, lit(1)).otherwise(lit(0)).as("is_dup"),
        coalesce(col("__dup"), lit(-1L)).as("dup_of")
      )
  }

  /** The direct all-pairs-within-cell formulation — retained ONLY as
    * the equivalence oracle for [[semDedupAssigned]]'s exact-collapse
    * plan (SemDedupSpec parity on duplicate-heavy and zero-vector
    * corpora; the SQL oracle spells this form too). */
  private[graft] def semDedupAssignedAllPairs(
      assigned: DataFrame,
      minCosine: Double = MinCosineDefault
  ): DataFrame = {
    val c = assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .withColumn("__nrm", Similarity.norm(col("embedding")))
    val dups = c
      .as("a")
      .join(
        c.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("nbr"),
        round(
          Similarity.dot(col("a.embedding"), col("b.embedding")) /
            (col("a.__nrm") * col("b.__nrm")),
          6
        ).as("cos_sim")
      )
      .where(col("cos_sim") >= minCosine)
      .groupBy("vec_id")
      .agg(min("nbr").as("dup_of"))
    assigned
      .select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cell"),
        when(col("dup_of").isNotNull, lit(1)).otherwise(lit(0)).as("is_dup"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of")
      )
  }

  val MinCosineDefault = 0.3
}
