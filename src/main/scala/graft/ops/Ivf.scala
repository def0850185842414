package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: partition the
  * corpus into `nLists` Voronoi cells (k-means centroids), store each
  * vector under its cell, and at query time scan only the `nProbe`
  * closest cells. This is the classic scale path for ANN over billions of
  * vectors: candidate generation is a bucket equi-join on cell id
  * (shuffle on a small key), and the expensive exact scoring touches only
  * `nProbe/nLists` of the corpus.
  *
  * Centroids are trained with a self-contained, fully deterministic
  * Lloyd's iteration on a driver-side sample (k-means over a bounded
  * sample is the standard IVF training recipe — FAISS does the same);
  * assignment is a broadcast argmin over the centroid table. No MLlib
  * dependency in the hot path.
  *
  * With `nProbe == nLists` results are exactly the brute-force top-k —
  * which is how the oracle checks this operator.
  */
object Ivf {

  /** Deterministic Lloyd's k-means on a driver-collected sample.
    *
    * The sample is hash-spread and ORDER-INVARIANT: rows are kept by
    * `xxhash64(embedding) % stride == 0` (stride sized from a count so
    * ~sampleSize survive) and sorted by two independent content hashes
    * before the strided init picks seeds. A `limit()` would instead
    * collect whichever partitions answered first — at cluster scale a
    * single corner of the corpus, silently skewing centroids, cell
    * balance, and recall. Content hashing keeps the same centroids for
    * the same corpus regardless of partitioning, file order, or
    * parallelism (IvfSpec asserts this). */
  def trainCentroids(
      corpus: DataFrame,
      nLists: Int,
      sampleSize: Int = 100000,
      iters: Int = 8
  ): Array[Array[Double]] =
    lloyd(collectSample(corpus, sampleSize), nLists, iters)

  /** The deterministic training sample described above — shared with
    * [[Pq]], whose per-subspace codebooks must come from the SAME
    * order-invariant sample recipe so IVF cells and PQ codes trained on
    * one corpus agree across partitionings. */
  private[graft] def collectSample(corpus: DataFrame, sampleSize: Int): Array[Array[Double]] = {
    val emb = corpus.select("embedding")
    val total = emb.count()
    val stride = math.max(1L, total / math.max(1, sampleSize))
    emb
      .select(
        col("embedding"),
        xxhash64(col("embedding")).as("__h1"),
        // second, independently-seeded hash: the sort tiebreak (h1
        // collisions across DISTINCT vectors would otherwise leave the
        // order partition-dependent)
        xxhash64(lit(1), col("embedding")).as("__h2")
      )
      .where(pmod(col("__h1"), lit(stride)) === 0)
      .orderBy(col("__h1"), col("__h2"))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
  }

  /** Deterministic Lloyd's iteration: evenly strided init over the
    * given sample order, fixed `iters` sweeps, empty cells keep their
    * centroid. Driver-side over the bounded sample. The ASSIGNMENT
    * phase —
    * the O(n·k·dim) term that dominates once nLists grows with the
    * corpus (SemDedupBench measured 20.5 s of a 27 s run at nLists=800)
    * — runs on the driver's cores via a parallel index stream: each
    * point's argmin is a pure function of (point, centroids) with a
    * strict `<` / lowest-index tiebreak, so scheduling cannot change
    * any verdict. The fp-sensitive ACCUMULATION stays sequential in
    * sample order, preserving the exact addition order of the old fused
    * loop — centroids are BIT-identical to it (IvfSpec pins this
    * against the retained [[lloydFused]]), so every generated oracle
    * (IVF/PQ/SemDeDup families) regenerates unchanged. */
  private[graft] def lloyd(
      sample: Array[Array[Double]],
      k: Int,
      iters: Int
  ): Array[Array[Double]] = {
    require(sample.length >= k, s"need >= $k vectors to train")
    val dim = sample(0).length
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    (0 until iters).foreach { _ =>
      val cents = centroids
      val assign = new Array[Int](sample.length)
      java.util.stream.IntStream.range(0, sample.length).parallel().forEach { i =>
        val v = sample(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val ct = cents(c)
          while (j < dim) { val t = v(j) - ct(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val best = assign(i)
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else { val s = sums(c); s.map(_ / counts(c)) }
      }
    }
    centroids
  }

  /** Distributed Lloyd trainer — the documented upgrade for nLists ≥
    * ~10⁴, where the driver assignment phase's O(sample·nLists·dim) per
    * sweep stops fitting one machine (at nLists 10⁴ × sample 10⁵ ×
    * dim 64 a sweep is 6·10¹⁰ flops — minutes per iteration on driver
    * cores, seconds across a cluster).
    *
    * Same order-invariant recipe as [[trainCentroids]]: the hash-strided
    * content-sorted sample, the same strided init over that order, the
    * same strict-< / lowest-index assignment tie-break (the native
    * [[graft.functions.ArgminCell]] kernel, broadcast centroids). The
    * accumulation — the one phase whose fp addition order a shuffle
    * would otherwise scramble — runs as per-(cell, component)
    * DECIMAL(38,12) sums: exact and associative, so the trained
    * centroids are BIT-identical across partitionings and parallelism
    * (IvfSpec pins a repartition A/B). They are NOT bit-equal to the
    * driver trainer's double accumulation — the two agree to fp
    * tolerance and on every assignment for separated data (spec-pinned);
    * pick ONE trainer per index build.
    *
    * Per iteration: the centroid table rides the stage's task binary
    * (serialized once per stage — nLists·dim·8 B, 5 MB at 10⁴×64), one
    * shuffle of sample·dim skinny component rows, one nLists·dim-row
    * driver collect. The sample itself never moves. */
  def trainCentroidsDistributed(
      corpus: DataFrame,
      nLists: Int,
      sampleSize: Int = 100000,
      iters: Int = 8
  ): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val emb = corpus.select("embedding")
    val total = emb.count()
    val stride = math.max(1L, total / math.max(1, sampleSize))
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sample = emb
      .select(
        col("embedding"),
        xxhash64(col("embedding")).as("__h1"),
        xxhash64(lit(1), col("embedding")).as("__h2"))
      .where(pmod(col("__h1"), lit(stride)) === 0)
      .orderBy(col("__h1"), col("__h2"))
      .limit(sampleSize)
      // the global limit collapses to one partition; restore parallelism
      // (safe: every downstream step is order-invariant by construction)
      .repartition(n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cnt = sample.count()
      require(cnt >= nLists, s"need >= $nLists vectors to train, got $cnt")
      // strided seeds over the (h1, h2) content order — the driver
      // trainer's sample(i·len/k) init, collected as k rows
      val seedIdx = (0 until nLists).map(i => i.toLong * cnt / nLists).toSet
      var centroids: Array[Array[Double]] = sample
        .orderBy("__h1", "__h2")
        .rdd
        .zipWithIndex()
        .filter { case (_, i) => seedIdx.contains(i) }
        .map { case (r, i) => (i, r.getSeq[Float](0).map(_.toDouble).toArray) }
        .collect()
        .sortBy(_._1)
        .map(_._2)
      val dim = centroids(0).length
      (0 until iters).foreach { _ =>
        val stats = sample
          .withColumn(
            "cell",
            graft.functions.ArgminCell.argminCell(col("embedding"), centroids))
          .select(col("cell"), posexplode(col("embedding")).as(Seq("j", "v")))
          .groupBy("cell", "j")
          .agg(
            sum(col("v").cast("decimal(38,12)")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val sums = Array.fill(nLists)(new Array[Double](dim))
        val counts = new Array[Long](nLists)
        stats.foreach { r =>
          val c = r.getInt(0)
          // exact decimal sum → one double division: a fixed function of
          // exact inputs, so deterministic regardless of execution order
          sums(c)(r.getInt(1)) = r.getDecimal(2).doubleValue()
          counts(c) = r.getLong(3)
        }
        val prev = centroids
        centroids = Array.tabulate(nLists) { c =>
          if (counts(c) == 0) prev(c)
          else {
            val m = new Array[Double](dim)
            var j = 0
            while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }
            m
          }
        }
      }
      centroids
    } finally { sample.unpersist(); () }
  }

  /** The original fused sequential sweep — retained ONLY as the
    * bit-identity witness for [[lloyd]]'s parallel assignment phase
    * (IvfSpec). */
  private[graft] def lloydFused(
      sample: Array[Array[Double]],
      k: Int,
      iters: Int
  ): Array[Array[Double]] = {
    require(sample.length >= k, s"need >= $k vectors to train")
    val dim = sample(0).length
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val ct = centroids(c)
          while (j < dim) { val t = v(j) - ct(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else { val s = sums(c); s.map(_ / counts(c)) }
      }
    }
    centroids
  }

  /** Corpus with a `cell` column + the centroid table — the IVF INDEX.
    * Build once per corpus (persist or write both sides); serve query
    * batches with [[topKIndexed]]. Assignment is the native
    * [[graft.functions.ArgminCell]] kernel — a primitive argmin sweep
    * per vector instead of the boxed-Seq UDF (kept below as the
    * equivalence oracle); this is the full-corpus scan of index build,
    * the one place the per-row cost multiplies by ALL vectors. */
  def assignCells(corpus: DataFrame, nLists: Int, sampleSize: Int = 100000): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, nLists, sampleSize)
    val assigned = corpus.withColumn(
      "cell",
      graft.functions.ArgminCell.argminCell(col("embedding"), centroids))
    val centroidDf = spark
      .createDataFrame(centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cell", "centroid")
    (assigned, centroidDf)
  }

  /** The UDF formulation [[assignCells]]' kernel replaced — equivalence
    * oracle for ArgminCellSpec. */
  private[graft] def cellUdf(
      spark: SparkSession,
      centroids: Array[Array[Double]]
  ): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(centroids)
    udf { (emb: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var j = 0
        val ct = cs(c)
        while (j < ct.length) { val t = emb(j) - ct(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  /** Top-k per query via IVF probing. `queries` small (broadcast).
    * Convenience wrapper that trains + assigns + probes in one call; a
    * real corpus builds the index ONCE ([[assignCells]], persisted /
    * written out) and serves many query batches through
    * [[topKIndexed]] — training cost amortizes to zero. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nLists: Int,
      nProbe: Int
  ): DataFrame = {
    val (assigned, centroids) = assignCells(corpus, nLists)
    topKIndexed(assigned, centroids, queries, k, nProbe)
  }

  /** Top-k per query over a PRE-BUILT index: `assigned` is the corpus
    * with its `cell` column, `centroids` the (cell, centroid) table —
    * both from [[assignCells]]. Cells are ranked per query ON THE
    * DRIVER from the collected batch (|queries| · nLists distance
    * sweeps — the same recipe as [[Pq.ivfPqTopK]]), so the serving plan
    * is ONE job: a bucket equi-join on `cell` against the broadcast
    * probe rows, touching ~nProbe/nLists of the corpus.
    *
    * `pruneIndexScan` (default true) applies the batch's probed cells
    * (≤ nLists values, known driver-side — no extra job) as a STATIC
    * `cell IN (...)` filter on the index scan.
    * Against a `partitionBy("cell")` parquet index that is partition
    * pruning at planning time — only the probed cells' files are listed
    * and read, the O(nProbe/nLists)-I/O layout a 100 TB index wants.
    * Static because it is deterministic: Spark's dynamic partition
    * pruning inserts its filter here but falls back to a no-op literal
    * when the broadcast-reuse heuristic declines (observed at AnnBench
    * scale), and a serving path should not leave 92 % of its I/O to a
    * heuristic. NOTE the batch-union effect either way: a batch probing
    * 8/64 cells per query prunes to the UNION of its probed cells, so
    * per-query I/O wins need small/targeted batches. */
  /** Rank cells per query ON THE DRIVER from the collected batch
    * (|queries| · nLists distance sweeps — both sides small by contract:
    * the batch is a serving request, the centroid table has nLists
    * rows). A cross-join + rank-window formulation instead costs a
    * second full execution of its un-persisted subtree when the
    * probed-cell set is collected for the static scan filter (the known
    * double-consumed-subtree trap — measured as q_ivf_topk 0.60→0.94 s
    * in r8). Distances accumulate left-to-right exactly like the
    * zip_with/aggregate fold they replaced, so the probed cell set — and
    * therefore every result — is bit-identical. Shared by the f32 path
    * below and the SQ8 path ([[Sq.topKIvf]]): returns
    * (query_id, probed cell, f32 query embedding). */
  /** Hard cap on the serving-batch collect in [[rankCells]]: the
    * queries frame is collected to the driver BY CONTRACT (it is a
    * serving request), so a caller handing it a corpus-sized frame
    * must fail fast with a pointer to the indexed batch path, not OOM
    * the driver. The probe itself is a `limit(cap+1)` — bounded
    * allocation even on a pathological input. */
  private[ops] val MaxServingBatch = 100000

  private[ops] def rankCells(
      queries: DataFrame,
      centroids: DataFrame,
      nProbe: Int
  ): Seq[(Long, Int, Seq[Float])] = {
    val cents = centroids
      .select(col("cell"), col("centroid"))
      .collect()
      .map(r => (r.getAs[Number]("cell").intValue, r.getSeq[Double](1).toArray))
    val qRows = queries
      .select(col("vec_id"), col("embedding"))
      .limit(MaxServingBatch + 1)
      .collect()
    require(
      qRows.length <= MaxServingBatch,
      s"rankCells is a serving-batch path (collects the queries frame to the driver): " +
        s"got more than $MaxServingBatch query rows — for corpus-sized query frames use " +
        s"the indexed batch operators (topKIndexed / hardNegativesIndexed cell joins)")
    qRows.toSeq
      .flatMap { r =>
        val qid = r.getLong(0)
        val qe = r.getSeq[Float](1)
        cents
          .map { case (cell, ct) =>
            var d = 0.0; var j = 0
            while (j < ct.length) { val t = qe(j).toDouble - ct(j); d += t * t; j += 1 }
            (cell, d)
          }
          .sortBy { case (cell, dist) => (dist, cell) }
          .take(nProbe)
          .map { case (cell, _) => (qid, cell, qe) }
      }
  }

  /** Hard-negative mining through the IVF index — the sublinear sibling
    * of [[Similarity.hardNegatives]] (which stays as the brute-force
    * recall oracle). Candidates come from the query's `nProbe` closest
    * cells (bucket equi-join on `cell`, same plan as [[topKIndexed]] —
    * no nested-loop anywhere); the label-inequality predicate is applied
    * per bucket, so at scale only ~nProbe/nLists of the corpus is
    * scored per query batch. `queries` must carry (vec_id, label,
    * embedding). With nProbe == nLists the result is EXACTLY the
    * brute-force output (full probing is exhaustive — which is how the
    * oracle checks it); recall at nProbe < nLists is measured in
    * IvfSpec against the brute-force form. Output schema matches
    * [[Similarity.hardNegatives]]: (query_id, vec_id, label, cos_sim,
    * rank), cos_sim rounded to 6dp with the same IEEE -0.0 fold. */
  /** Shared IVF serving plumbing behind [[topKIndexed]] and
    * [[hardNegativesIndexed]]: optionally prune the index scan to the
    * batch's probed cells (the static `cell IN (...)` filter — see the
    * [[topKIndexed]] note on why static beats dynamic partition
    * pruning here), precompute the corpus-row norm, and bucket
    * equi-join against the broadcast probe rows. `probed` must carry
    * (query_id, qe, qn, cell) plus any caller columns (e.g. the query
    * label); candidates come back with `cn` attached. */
  private[ops] def probedCandidates(
      assigned: DataFrame,
      probedRows: Seq[(Long, Int, Seq[Float])],
      probed: DataFrame,
      pruneIndexScan: Boolean
  ): DataFrame = {
    val indexSide =
      if (!pruneIndexScan) assigned
      else {
        val probedCells = probedRows.map(_._2).distinct.sorted
        assigned.where(col("cell").isin(probedCells: _*))
      }
    indexSide
      .withColumn("cn", Similarity.norm(col("embedding")))
      .join(broadcast(probed), "cell")
  }

  /** Exact cosine of a candidate pair at 6dp (norms precomputed per
    * row, one dot-product traversal per pair). */
  private[ops] def cosSim6: Column =
    round(Similarity.dot(col("embedding"), col("qe")) / (col("cn") * col("qn")), 6)

  /** row_number over (cos_sim desc, vec_id asc) per query, keep ≤ k —
    * the deterministic top-k tie-break every serving path shares. */
  private[ops] def rankTopK(scored: DataFrame, k: Int, outCols: Seq[String]): DataFrame = {
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(outCols.map(col): _*)
  }

  def hardNegativesIndexed(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      pruneIndexScan: Boolean = true
  ): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probedRows = rankCells(queries, centroids, nProbe)
    // attach the query label to the probe rows: both sides are
    // serving-batch-sized (|q| · nProbe vs |q|), a trivial local join
    val qlab = queries.select(col("vec_id").as("query_id"), col("label").as("query_label"))
    val probed = probedRows
      .toDF("query_id", "cell", "qe")
      .join(qlab, "query_id")
      .select(
        col("query_id"), col("query_label"), col("qe"),
        Similarity.norm(col("qe")).as("qn"), col("cell"))
    val scored = probedCandidates(assigned, probedRows, probed, pruneIndexScan)
      .where(col("label") =!= col("query_label"))
      .select(
        col("query_id"),
        col("vec_id"),
        col("label"),
        // same 6dp round + IEEE -0.0 fold as Similarity.hardNegatives
        (cosSim6 + lit(0.0)).as("cos_sim"))
    rankTopK(scored, k, Seq("query_id", "vec_id", "label", "cos_sim", "rank"))
  }

  def topKIndexed(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      pruneIndexScan: Boolean = true
  ): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probedRows = rankCells(queries, centroids, nProbe)
    val probed = probedRows
      .toDF("query_id", "cell", "qe")
      .select(col("query_id"), col("qe"), Similarity.norm(col("qe")).as("qn"), col("cell"))
    val scored = probedCandidates(assigned, probedRows, probed, pruneIndexScan)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosSim6.as("cos_sim"))
    rankTopK(scored, k, Seq("query_id", "vec_id", "cos_sim", "rank"))
  }
}
