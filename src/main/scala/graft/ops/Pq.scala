package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory/IO side of billion-scale ANN,
  * complementing [[Ivf]]'s candidate pruning. Each embedding is split
  * into `m` contiguous subvectors; per subspace a `ksub`-word codebook
  * is k-means-trained, and a vector is stored as `m` code BYTES instead
  * of `4·dim` float bytes (64× at dim=64, m=4, float32). At 100 TB of
  * embeddings the serving scan reads the CODES table; full vectors are
  * fetched only for the shortlist a query re-ranks.
  *
  * Serving uses asymmetric distance computation (ADC): per query, one
  * `m·ksub` lookup table of partial squared L2s is built driver-side
  * (the only float-vs-codeword arithmetic), and scoring a corpus row is
  * `m` table lookups ([[graft.functions.PqAdc]], codegen'd). Recall
  * comes from the shortlist-then-rerank shape: ADC ranks a shortlist of
  * `rerank·k` candidates from codes alone, then exact distances on the
  * fetched shortlist vectors pick the final top-k (PqBench measures the
  * recall/IO trade).
  *
  * Training reuses [[Ivf]]'s deterministic sample + Lloyd recipe per
  * subspace — same corpus ⇒ same codebooks, regardless of partitioning.
  */
object Pq {

  /** Per-subspace codebooks `[m][ksub][dim/m]`, k-means-trained on the
    * shared deterministic sample. */
  def train(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      sampleSize: Int = 100000,
      iters: Int = 8
  ): Array[Array[Array[Double]]] = {
    require(ksub >= 1 && ksub <= 256, s"1..256 codewords (codes are bytes), got $ksub")
    val sample = Ivf.collectSample(corpus, sampleSize)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      Ivf.lloyd(sub, ksub, iters)
    }
  }

  /** The corpus reduced to its PQ CODES table — `(…ids…, code: binary)`.
    * This is what a deployment WRITES as the serving table; at dim=64 /
    * m=4 it is 64× smaller than the float vectors it replaces. */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    corpus.withColumn(
      "code",
      graft.functions.PqEncode.pqEncode(col("embedding"), codebooks))

  /** The flattened ADC lookup table for one query vector:
    * `lut(s·ksub + c) = ‖q_sub(s) − codebook(s)(c)‖²`. */
  private[graft] def lutFor(
      q: Array[Double],
      codebooks: Array[Array[Array[Double]]]
  ): Array[Double] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(q.length == m * dsub, s"query dim ${q.length} != $m x $dsub")
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var c = 0
      while (c < ksub) {
        val w = codebooks(s)(c)
        var d = 0.0
        var j = 0
        while (j < dsub) { val t = q(base + j) - w(j); d += t * t; j += 1 }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    lut
  }

  /** ADC top-k over a codes table: queries (small — collected to build
    * LUTs, broadcast into the scan) × codes, `m` lookups per pair, rank
    * window per query. Ties break on vec_id after rounding to 6dp, same
    * determinism contract as [[Similarity.bruteForceTopK]]. Output:
    * `(query_id, vec_id, adc_dist, rank)`, rank 1 = nearest. */
  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      k: Int
  ): DataFrame = {
    val spark = codes.sparkSession
    val qRows = queries.select(col("vec_id"), col("embedding")).collect().map { r =>
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), lutFor(q, codebooks).toSeq)
    }.toSeq
    val luts = spark.createDataFrame(qRows).toDF("query_id", "lut")
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
    // project to (vec_id, code) BEFORE the scan join: a codes table that
    // still carries the embedding (e.g. encode()'s output used directly)
    // must not drag 4·dim-byte vectors through the ADC scan — the
    // m-byte-per-row scan IS the operator's point
    codes
      .select(col("vec_id"), col("code"))
      .crossJoin(broadcast(luts))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(graft.functions.PqAdc.pqAdc(col("code"), col("lut")), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact squared-L2 top-k over the full vector table — the ground
    * truth ADC approximates (and PqBench's recall baseline). Same
    * broadcast-queries cross-join shape as
    * [[Similarity.bruteForceTopK]]; per-side self-dots are computed once
    * so each pair costs one [[graft.functions.DotF32]] pass. */
  def l2TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val dot = graft.functions.DotF32.dot _
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      dot(col("embedding"), col("embedding")).as("qq"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("l2_dist").asc, col("vec_id").asc)
    corpus
      .withColumn("xx", dot(col("embedding"), col("embedding")))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(col("xx") + col("qq") - lit(2.0) * dot(col("embedding"), col("qe")), 6)
          .as("l2_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The production serving shape: ADC-shortlist `rerank·k` candidates
    * from the CODES table, fetch only the shortlist's full vectors
    * (broadcast hash join — the corpus vector table is probe-side and
    * never shuffles), exact-L2 re-rank to the final k. Output:
    * `(query_id, vec_id, l2_dist, rank)`. */
  def adcTopKReranked(
      codes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      rerank: Int = 4
  ): DataFrame = {
    require(rerank >= 1, s"rerank factor must be >= 1, got $rerank")
    val shortlist = adcTopK(codes, queries, codebooks, k * rerank)
      .select(col("query_id"), col("vec_id"))
    rerankExact(shortlist, corpus, queries, k)
  }

  /** Exact-L2 re-rank of a `(query_id, vec_id)` shortlist: the shortlist
    * is |queries|·rerank·k rows — broadcast it; the full vector table is
    * the probe side of both joins and never shuffles. */
  private def rerankExact(
      shortlist: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    val fetched = corpus
      .select(col("vec_id"), col("embedding"))
      .join(broadcast(shortlist), Seq("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val sq = graft.functions.DotF32.dot(col("embedding"), col("embedding")) +
      graft.functions.DotF32.dot(col("qe"), col("qe")) -
      lit(2.0) * graft.functions.DotF32.dot(col("embedding"), col("qe"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("l2_dist").asc, col("vec_id").asc)
    fetched
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), round(sq, 6).as("l2_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ----- IVF-PQ: residual quantization under a coarse quantizer -----

  /** Residual codebooks for IVF-PQ, trained on `x − centroid(cell(x))`
    * over the shared deterministic sample. Subtracting the coarse
    * centroid removes the cluster-center component, so code resolution
    * is spent on WITHIN-cell variation — on tightly clustered corpora
    * this is the difference between useless and usable ADC recall
    * (PqBench measures both). */
  def trainResidual(
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      m: Int,
      ksub: Int,
      sampleSize: Int = 100000,
      iters: Int = 8
  ): Array[Array[Array[Double]]] = {
    require(ksub >= 1 && ksub <= 256, s"1..256 codewords (codes are bytes), got $ksub")
    val sample = Ivf.collectSample(corpus, sampleSize)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    val residuals = sample.map { v =>
      val c = centroids(nearestCentroid(v, centroids))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    Array.tabulate(m) { s =>
      val sub = residuals.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      Ivf.lloyd(sub, ksub, iters)
    }
  }

  private[graft] def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var d = 0.0; var j = 0
      while (j < ct.length) { val t = v(j) - ct(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The IVF-PQ index: `(…ids…, cell, code)` — coarse cell via the
    * [[graft.functions.ArgminCell]] kernel, residual code via the fused
    * [[graft.functions.PqEncodeResidual]] (the residual vector never
    * materializes). Write it `partitionBy("cell")` and serving prunes to
    * the probed cells' files. */
  def encodeIvfPq(
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]
  ): DataFrame =
    corpus
      .withColumn("cell", graft.functions.ArgminCell.argminCell(col("embedding"), centroids))
      .withColumn(
        "code",
        graft.functions.PqEncodeResidual
          .pqEncodeResidual(col("embedding"), col("cell"), centroids, codebooks))

  /** IVF-PQ serving: probe `nProbe` cells per query, ADC-score only
    * those cells' codes against per-(query, cell) RESIDUAL LUTs
    * (`‖x−q‖² = ‖r_x − (q − centroid)‖²`, so scores stay comparable
    * across cells), shortlist `rerank·k`, exact re-rank on the fetched
    * vectors. Cell ranking and LUTs are driver-computed from the
    * collected queries (|queries|·nProbe·m·ksub doubles — broadcast);
    * with `pruneIndexScan` the probed-cell union becomes a static
    * `cell IN (…)` filter, which against a cell-partitioned codes table
    * is partition pruning at planning time — the same
    * O(probed/total)-I/O layout as [[Ivf.topKIndexed]], but scanning
    * m-byte codes instead of 4·dim-byte vectors. */
  def ivfPqTopK(
      index: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      nProbe: Int,
      rerank: Int = 4,
      pruneIndexScan: Boolean = true
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length, s"nProbe $nProbe out of range")
    require(rerank >= 1, s"rerank factor must be >= 1, got $rerank")
    val spark = index.sparkSession
    val qRows = queries.select(col("vec_id"), col("embedding")).collect().flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      val ranked = centroids.indices
        .map(c => (c, {
          val ct = centroids(c)
          var d = 0.0; var j = 0
          while (j < ct.length) { val t = q(j) - ct(j); d += t * t; j += 1 }
          d
        }))
        .sortBy { case (c, d) => (d, c) }
        .take(nProbe)
      ranked.map { case (c, _) =>
        val ct = centroids(c)
        val rq = Array.tabulate(q.length)(j => q(j) - ct(j))
        (qid, c, lutFor(rq, codebooks).toSeq)
      }
    }.toSeq
    val luts = spark.createDataFrame(qRows).toDF("query_id", "cell", "lut")
    val probed = index
      .select(col("vec_id"), col("cell"), col("code")) // never drag extra columns through the scan
      .transform(df =>
        if (pruneIndexScan) {
          val cells = qRows.map(_._2).distinct.sorted
          df.where(col("cell").isin(cells: _*))
        } else df)
      .join(broadcast(luts), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
    val shortlist = probed
      .select(
        col("query_id"),
        col("vec_id"),
        round(graft.functions.PqAdc.pqAdc(col("code"), col("lut")), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k * rerank)
      .select(col("query_id"), col("vec_id"))
    rerankExact(shortlist, corpus, queries, k)
  }
}
