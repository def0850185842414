package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotI8

/** SQ8 — symmetric per-vector int8 scalar quantization for embedding
  * serving, the simplest point on the compression curve between raw
  * f32 ([[Similarity]]) and PQ codes ([[Pq]]): 4× smaller vectors, exact
  * integer scoring arithmetic, no training step and no codebook to
  * version. Each vector is scaled by its own max-abs so the largest
  * component maps to ±127:
  *
  *   scale(v) = max_i |v_i| / 127      q_i = ⌊ v_i / scale + 0.5 ⌋
  *
  * Cosine over quantized vectors needs NO dequantization: the per-vector
  * scales cancel in dot(q_a,q_b) / (‖q_a‖·‖q_b‖), so serving is pure
  * int64 arithmetic ([[graft.functions.DotI8]]) over 4×-smaller rows —
  * bit-identical across engines (the only float step, quantization
  * itself, is plain IEEE double ops reproducible in SQL).
  *
  * Scale shape: [[quantize]] is a stateless per-row map (no shuffle, no
  * training); the quantized table is what a serving fleet loads —
  * memory ∝ dims bytes/vector instead of 4·dims, the difference between
  * an in-RAM and a spilling index at 10⁹ vectors. [[topK]] is the
  * brute-force scan baseline (query side broadcast); compose with
  * [[Ivf]] cells for sublinear probes — the quantized column drops in
  * wherever the f32 column was.
  */
object Sq {

  /** Floor(x/scale + 0.5) clamps naturally to [−127, 127]: |x| ≤ maxabs
    * ⇒ |x/scale| ≤ 127, and the +0.5 rounding cannot push past the open
    * bound. The 1e-30 floor keeps an all-zero vector from dividing by
    * zero (its q is all zeros). */
  def quantize(
      embeddings: DataFrame,
      embCol: String = "embedding",
      dropInput: Boolean = true
  ): DataFrame = {
    val scale = greatest(
      array_max(transform(col(embCol), x => abs(x))).cast("double") / lit(127.0),
      lit(1e-30))
    val q = embeddings
      .withColumn("scale", scale)
      .withColumn("qvec",
        transform(col(embCol), x => floor(x.cast("double") / col("scale") + lit(0.5)).cast("tinyint")))
      .withColumn("qsq", DotI8.dot(col("qvec"), col("qvec")))
    if (dropInput) q.drop(embCol) else q
  }

  /** Quantized cosine: scales cancel, so this is int64-exact.
    * `try_divide` (not `/`): a zero-norm side makes the divisor 0, which
    * under Spark's default ANSI mode would THROW mid-job — try_divide
    * yields NULL in both ANSI modes, and the scoring paths drop those
    * rows (the zero-norm exclusion). */
  def cosineQ(qa: Column, qb: Column, sqa: Column, sqb: Column): Column =
    try_divide(
      DotI8.dot(qa, qb).cast("double"),
      sqrt(sqa.cast("double")) * sqrt(sqb.cast("double")))

  /** Brute-force top-k over the quantized corpus for a small broadcast
    * query set (both sides pre-quantized by [[quantize]]). Same rounding
    * /tie contract as [[Similarity.bruteForceTopK]]: cosine rounded to
    * 6dp BEFORE ranking, ties break on vec_id. Output:
    * (query_id, vec_id, cos_q, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("qvec").as("q_qvec"),
      col("qsq").as("q_qsq"))
    val scored = corpus
      .select(col("vec_id"), col("qvec"), col("qsq"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(cosineQ(col("qvec"), col("q_qvec"), col("qsq"), col("q_qsq")), 6).as("cos_q"))
      // a zero-norm vector has no direction: cos_q is NULL (try_divide)
      // exactly when either side's norm is zero — dropping those rows IS
      // the zero-norm exclusion (mirrored in the SQL oracle's s > 0
      // predicates). Filtering HERE costs one null-check per pair;
      // a qsq>0 PRE-filter instead pushes below the quantize projection
      // and re-evaluates the whole per-element transform (measured 2.5×
      // on q_sq8_topk).
      .where(col("cos_q").isNotNull)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_q").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos_q", "rank")
  }

  /** IVF-probed SQ8 serving — the sublinear path: the quantized column
    * drops in wherever the f32 column was. `assignedQ` is the
    * cell-assigned corpus with qvec/qsq and NO f32 column (that is the
    * 4× memory point); `centroids` from [[Ivf.assignCells]]; `queries`
    * quantized with `dropInput = false` (the f32 embedding ranks cells
    * driver-side via [[Ivf.rankCells]], the int8 columns score). Same
    * plan shape as [[Ivf.topKIndexed]]: broadcast probe rows, bucket
    * equi-join on cell (~nProbe/nLists of the index touched, static
    * probed-cell pruning), per-query window over candidates. At
    * nProbe == nLists this equals [[topK]] exactly (every pair scored
    * once) — which is what its oracle checks. */
  def topKIvf(
      assignedQ: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      pruneIndexScan: Boolean = true
  ): DataFrame = {
    val spark = assignedQ.sparkSession
    import spark.implicits._
    val probedRows = Ivf.rankCells(queries, centroids, nProbe)
    val probePairs = probedRows.map { case (qid, cell, _) => (qid, cell) }
      .toDF("query_id", "cell")
    val probe = probePairs.join(
      queries.select(
        col("vec_id").as("query_id"),
        col("qvec").as("q_qvec"),
        col("qsq").as("q_qsq")),
      Seq("query_id"))
    val indexSide =
      if (!pruneIndexScan) assignedQ
      else {
        val probedCells = probedRows.map(_._2).distinct.sorted
        assignedQ.where(col("cell").isin(probedCells: _*))
      }
    val scored = indexSide
      .select(col("vec_id"), col("cell"), col("qvec"), col("qsq"))
      .join(broadcast(probe), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(cosineQ(col("qvec"), col("q_qvec"), col("qsq"), col("q_qsq")), 6).as("cos_q"))
      .where(col("cos_q").isNotNull) // zero-norm exclusion — see [[topK]]
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_q").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos_q", "rank")
  }
}
