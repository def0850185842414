package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Distributed graph centrality for curation pipelines.
  *
  * Web-scale corpora carry a link structure (page → page, domain →
  * domain, doc → quoted doc) and the standard authority signal over it
  * is PageRank (Page et al. 1999; used as a quality prior by
  * CommonCrawl-derived corpus builders). The operator is generic over
  * any (src, dst[, weight]) edge list — the q_pagerank oracle drives it
  * with the customer↔supplier co-purchase graph derived from
  * orders⋈lineitem, and near-dup pair graphs from
  * [[DedupDocs.minhashCandidates]] plug in unchanged.
  *
  * Execution shape (the 100 TB contract):
  *   - The transition matrix (src, dst, p = w / outW) is built ONCE,
  *     hash-partitioned by `src`, and persisted through the same
  *     internal-row lineage cut as [[DedupDocs.connectedComponents]] —
  *     each Lloyd-style round's logical plan is a scan of the cached
  *     RDD, not a re-analysis of the whole upstream pipeline.
  *   - Each iteration is ONE shuffle: ranks arrive hash-partitioned on
  *     the node id from the previous round's groupBy, the matrix side is
  *     cached pre-partitioned on `src`, so the join is exchange-free and
  *     only the contribution groupBy(dst) exchanges.
  *   - Dangling mass (rank parked on nodes with no out-edges) is folded
  *     back uniformly inside the SAME plan via a one-row aggregate
  *     cross-joined as a scalar — no extra driver action per round.
  *   - Rounds are bounded by `iterations`; `tol > 0` adds an L1-delta
  *     convergence check (one extra scalar aggregate per round).
  *
  * Semantics (mirrored term-for-term by the unrolled-CTE DuckDB oracle):
  * parallel edges collapse by weight sum; self-loops are legal;
  * `rank₀ = 1/N`; `rankₖ₊₁(v) = (1-d)/N + d·(Σ_{u→v} rankₖ(u)·p(u,v)
  * + danglingₖ/N)`. Output is (node, rank) with Σ rank = 1.
  */
object Graph {

  /** Fixed-round loops (LPA, HITS, pagerank with tol=0) defer cache
    * release so the whole round chain materializes as ONE job — but an
    * unbounded deferral holds every round's O(nodes) cut resident
    * simultaneously (peak storage = iterations × nodes rows;
    * MEMORY_AND_DISK spills rather than fails, yet eviction pressure
    * can thrash the static matrix/edge caches at high iteration
    * counts). Every `deferralWindow` deferred cuts the loop runs one
    * checkpoint action and releases the window, bounding peak resident
    * cache at `deferralWindow × O(nodes)` while keeping the driver-job
    * count at ⌈iterations / deferralWindow⌉ instead of `iterations`
    * (ADVICE r16). Typical crawl-curation calls (3–10 rounds) never
    * hit the window, so their one-job behavior is unchanged. */
  private val deferralWindow = 8

  import graft.util.LoopFrames.{cut, cutPartitioned}

  /** Weighted PageRank over an edge list.
    *
    * @param edges     (src, dst) pairs, any id type; directed
    * @param iterations power-iteration rounds (the oracle unrolls the
    *                  same count)
    * @param damping   d in [0, 1)
    * @param weightCol optional edge-weight column name in `edges`;
    *                  absent ⇒ every edge weighs 1
    * @param tol       if > 0, stop early once the L1 delta between
    *                  consecutive rank vectors drops below it
    * @param restartNodes optional seed set (column `node`) for
    *                  PERSONALIZED PageRank (TrustRank-style crawl
    *                  seeding): the restart and dangling mass land on
    *                  the seeds (uniformly over those present in the
    *                  graph; absent seeds are ignored) instead of all
    *                  nodes, and rank₀ = the seed distribution. None ⇒
    *                  classic uniform PageRank, numerically unchanged.
    * @return (node, rank) — rank sums to 1 over all nodes
    */
  def pagerank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      weightCol: Option[String] = None,
      tol: Double = 0.0,
      restartNodes: Option[DataFrame] = None,
      // broadcast-sized graphs skip the distributed loop: 5–10 rounds of
      // tiny-stage scheduling cost more than one driver pass (the
      // connectedComponents driverEdgeLimit precedent — the 1.2M-arc
      // co-purchase graph measured 12.4 s distributed vs ~2 s driver; a
      // 2M-arc collect is ~200 MB transient on the driver)
      driverEdgeLimit: Long = 2000000L,
      // a caller whose edge list is ALREADY one row per (src, dst) — a
      // groupBy/distinct output, a deduplicated edge table — skips the
      // operator's own collapse exchange (1 full shuffle of the edge
      // list). The promise is the caller's: duplicate arcs under this
      // flag double-count weight.
      assumeCollapsed: Boolean = false,
      // treat every input arc as BOTH directions (src→dst AND dst→src,
      // same weight) — the undirected/co-occurrence spelling. The caller
      // could equally explode/union both directions itself; declaring it
      // here halves the cached arc frame and the driver-gate collect
      // (r18: the q_pagerank co-purchase graph collected 1.17 M exploded
      // rows where 587 k carry the same information). Under
      // assumeCollapsed the caller additionally promises src↔dst pairs
      // are unique AND no arc appears in both orientations.
      symmetrize: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping >= 0 && damping < 1, s"damping must be in [0,1), got $damping")
    val spark = edges.sparkSession
    val w = weightCol.map(col).getOrElse(lit(1.0)).cast("double")

    // collapse parallel edges once; everything downstream is per unique
    // arc. Under symmetrize only the HALF list is cached/collected —
    // the mirrored direction is derived (flatMap on the driver, a cache
    // re-read union in the distributed lane).
    val (half, halfRdd) = cut(
      if (assumeCollapsed) edges.select(col("src"), col("dst"), w.as("w"))
      else if (symmetrize)
        // collapse the canonical half: parallel arcs in EITHER
        // orientation merge onto the same undirected pair
        edges
          .select(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"), w.as("w"))
          .groupBy(col("src"), col("dst")).agg(sum(w).as("w"))
      else edges.groupBy(col("src"), col("dst")).agg(sum(w).as("w"))
    )
    val nHalf = half.count()
    val nArcs = if (symmetrize) 2 * nHalf else nHalf
    val mirrored =
      half.select(col("dst").as("src"), col("src").as("dst"), col("w"))
    val (arcs, arcsRdd) =
      if (symmetrize) (half.unionAll(mirrored), halfRdd) else (half, halfRdd)
    if (nArcs <= driverEdgeLimit) {
      // InternalRow copies straight off the cache — collecting external
      // Rows instead measured 2.5 s of pure conversion at 1.2M arcs.
      // Under symmetrize the mirrored arcs are interleaved INSIDE the
      // driver kernel (fwd then rev per collected row — the same order
      // an exploded both-directions frame collects in, so the float
      // fold order and the 6dp-rounded ranks are bit-identical to the
      // caller exploding both directions itself).
      val rows = halfRdd.collect()
      halfRdd.unpersist(blocking = false)
      // seed values as InternalRow-copied values so they compare equal
      // to the idx keys (UTF8String for strings); a seed set is small
      // by its nature (a trusted whitelist), the collect is caller-sized
      val seedVals = restartNodes.map { rn =>
        val nodeType = rn.select(col("node")).schema.fields(0).dataType
        Bridge.toInternalRdd(rn.select(col("node")).where(col("node").isNotNull).distinct())
          .map(_.copy()).collect()
          .map(r => InternalRow.copyValue(r.get(0, nodeType)))
      }
      return pagerankDriver(spark, rows, arcs.schema, iterations, damping, tol, seedVals,
        symmetrize)
    }

    // node universe: src ∪ dst in one pass (explode, not union, so the
    // upstream edge pipeline is evaluated once)
    val (nodes, nodesRdd) = cut(
      arcs
        .select(explode(array(col("src"), col("dst"))).as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("__deg"))
        .select("node")
        .repartition(col("node"))
    )
    val n = nodes.count()
    require(n > 0, "pagerank over an empty edge list")
    val uniform = 1.0 / n

    // restart distribution `__s` per node: uniform 1/N (classic), or
    // 1/|S∩V| on the present seeds and 0 elsewhere (personalized). The
    // classic path's arithmetic is bit-identical to the pre-refactor
    // constant form — (1−d)·(1/N) and dm·(1/N) multiply the same
    // doubles whether the factor is folded in Scala or rides a column.
    val (nodesS, nodesSRdd) = restartNodes match {
      case None => cut(nodes.withColumn("__s", lit(uniform)))
      case Some(rn) =>
        val seeds = rn.select(col("node")).where(col("node").isNotNull).distinct()
          .join(nodes, Seq("node"), "left_semi")
        val k = seeds.count()
        require(k > 0, "pagerank restartNodes share no node with the edge list")
        cut(nodes
          .join(seeds.withColumn("__m", lit(true)), Seq("node"), "left")
          .select(col("node"),
            when(col("__m").isNotNull, lit(1.0 / k)).otherwise(lit(0.0)).as("__s")))
    }
    nodesS.count()

    // transition matrix: hash-partitioned AND sorted on src ONCE, with
    // the layout declared to Catalyst — every iteration's rank⋈matrix
    // join then needs neither an exchange nor a sort on this (big,
    // static) side; only the small rank vector moves
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val outW = arcs.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val (matrix, matrixRdd) = cutPartitioned(
      arcs
        .join(outW, Seq("src"))
        .select(col("src"), col("dst"), (col("w") / col("out_w")).as("p"))
        .repartition(shufflePartitions, col("src"))
        .sortWithinPartitions("src"),
      Seq("src"),
      shufflePartitions
    )
    matrix.count()

    // nodes with no out-edges park their rank; fold it back uniformly.
    // Counting here both materializes the cache AND lets a graph with no
    // dangling nodes (every symmetric graph) drop the whole term — one
    // aggregate + one broadcast fewer per round
    val (dangling, danglingRdd) = cut(
      nodes.join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
    )
    val nDangling = dangling.count()

    var (ranks, ranksRdd) = cut(nodesS.select(col("node"), col("__s").as("rank")))
    ranks.count()
    // the loop reads only the partitioned matrix / nodes / dangling
    // caches — the unordered arc cache is a redundant full copy of the
    // edge list from here
    arcsRdd.unpersist(blocking = false)

    var iter = 0
    var done = false
    val deferredRanks = scala.collection.mutable.ListBuffer[
      org.apache.spark.rdd.RDD[InternalRow]]()
    while (iter < iterations && !done) {
      val contrib = matrix
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("in_rank"))
      val withContrib = nodesS.join(contrib, Seq("node"), "left")
      val folded =
        if (nDangling == 0L) {
          withContrib.select(
            col("node"),
            (lit(1.0 - damping) * col("__s") +
              lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
        } else {
          val danglingMass = ranks
            .join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
          withContrib
            .crossJoin(broadcast(danglingMass))
            .select(
              col("node"),
              (lit(1.0 - damping) * col("__s") +
                lit(damping) *
                (coalesce(col("in_rank"), lit(0.0)) + col("dm") * col("__s")))
                .as("rank"))
        }
      val (next, nextRdd) = cut(folded)
      if (tol > 0) {
        // the convergence gate READS each round's result — a per-round
        // driver action is inherent here, and the previous round can
        // release immediately (both frames are materialized by the
        // delta join)
        val delta = next
          .join(ranks.withColumnRenamed("rank", "__prev"), Seq("node"))
          .agg(sum(abs(col("rank") - col("__prev"))))
          .head()
          .getDouble(0)
        if (delta < tol) done = true
        ranksRdd.unpersist(blocking = false)
      } else {
        // fixed round count (the LPA discipline): nothing reads a
        // per-round result, so the chain stays lazy — the final
        // ranks.count() below executes all rounds as ONE job (each
        // intermediate computes exactly once; persisted, consumed in
        // stage dependency order) and the intermediate caches release
        // after it. Saves `iterations` driver jobs per call. (The
        // "exactly once" claim holds because the single job's broadcast
        // stages — danglingMass here — materialize in dependency
        // order; a concurrently-prepared broadcast could recompute an
        // upstream benignly, never affecting results.)
        deferredRanks += ranksRdd
      }
      ranks = next
      ranksRdd = nextRdd
      iter += 1
      // bound peak storage at deferralWindow × O(nodes): deferral keeps
      // EVERY round's cut resident until materialization, so a long
      // fixed-round run would otherwise hold iterations × nodes rows
      // cached (MEMORY_AND_DISK spills rather than fails, but eviction
      // can thrash the static matrix cache). One checkpoint job per
      // window keeps ~all of the driver-job savings (ADVICE r16).
      if (tol <= 0 && deferredRanks.size >= deferralWindow) {
        ranks.count()
        deferredRanks.foreach(_.unpersist(blocking = false))
        deferredRanks.clear()
      }
    }

    // Materialize the final vector before releasing the loop's cached
    // inputs, then hand back the cache-backed frame itself (the
    // connectedComponents precedent): O(nodes) rows × 2 columns is the
    // natural serving artifact, and collecting it to the driver would
    // cap the operator at driver-memory-sized graphs.
    ranks.count()
    deferredRanks.foreach(_.unpersist(blocking = false))
    Seq(arcsRdd, matrixRdd, nodesRdd, nodesSRdd, danglingRdd)
      .foreach(_.unpersist(blocking = false))
    ranks
  }

  /** HITS hubs and authorities (Kleinberg 1999) — the complementary
    * centrality to [[pagerank]]: PageRank scores global visit
    * probability; HITS separates "pointed at by good hubs" (authority)
    * from "points at good authorities" (hub), which is the signal a
    * crawl curator wants when link DIRECTORIES and link TARGETS play
    * different roles (hub-y aggregator domains vs authoritative
    * content domains).
    *
    * Recurrence (mirrored term-for-term by the unrolled-CTE oracle):
    * h₀ = 1/N on every node; per round, a′(v) = Σ_{u→v} h(u)·w, then
    * L1-normalize; h′(u) = Σ_{u→v} a(v)·w, then L1-normalize. L1 (not
    * the textbook L2) keeps both normalizers plain SUM aggregates —
    * same fixed point direction, and the scores read as mass shares.
    * Given ≥1 edge the normalizers stay positive: every positive-hub
    * node has an out-edge by construction, every positive-authority
    * node an in-edge, so each half-round's total inherits positivity.
    * Weights must be positive (a zero/negative weight can void that
    * argument); parallel edges collapse by weight sum.
    *
    * Execution shape: the SAME loop contract as [[pagerank]] — the arc
    * matrix is cached TWICE, hash-partitioned + sorted on `src` and on
    * `dst` with the layout declared to Catalyst, so each half-round
    * joins its static side exchange-free and only the O(nodes) score
    * vector plus one groupBy combine move; normalization is a one-row
    * aggregate broadcast back as a scalar. Score vectors stay SPARSE
    * inside the loop (auth only on in-edged nodes, hub only on
    * out-edged ones — the zeros the recurrence would carry anyway) and
    * widen to the full node universe once at the end. Broadcast-sized
    * graphs take the same driver fast path as pagerank.
    *
    * @return (node, authority, hub); each column sums to 1 (nodes
    *         missing a side score 0.0)
    */
  def hits(
      edges: DataFrame,
      iterations: Int = 5,
      weightCol: Option[String] = None,
      driverEdgeLimit: Long = 2000000L,
      assumeCollapsed: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    val w = weightCol.map(col).getOrElse(lit(1.0)).cast("double")

    val (arcs, arcsRdd) = cut(
      if (assumeCollapsed) edges.select(col("src"), col("dst"), w.as("w"))
      else edges.groupBy(col("src"), col("dst")).agg(sum(w).as("w"))
    )
    // one pass for both gates: count for the driver-path decision, min
    // collapsed weight for the positivity requirement the normalizer
    // argument rests on (a zero/negative weight would make an L1 total
    // 0 and the scores silently NULL/NaN — fail fast instead)
    val arcStats = arcs.agg(count(lit(1)).as("__n"), min(col("w")).as("__mn")).collect()(0)
    val nArcs = arcStats.getLong(0)
    require(nArcs > 0, "hits over an empty edge list")
    require(
      arcStats.getDouble(1) > 0.0,
      s"hits requires positive edge weights; min collapsed weight = ${arcStats.getDouble(1)}")
    if (nArcs <= driverEdgeLimit) {
      val rows = arcsRdd.collect()
      arcsRdd.unpersist(blocking = false)
      return hitsDriver(spark, rows, arcs.schema, iterations)
    }

    val (nodes, nodesRdd) = cut(
      arcs
        .select(explode(array(col("src"), col("dst"))).as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("__deg"))
        .select("node")
        .repartition(col("node"))
    )
    val n = nodes.count()

    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val (bySrc, bySrcRdd) = cutPartitioned(
      arcs.repartition(shufflePartitions, col("src")).sortWithinPartitions("src"),
      Seq("src"),
      shufflePartitions)
    bySrc.count()
    val (byDst, byDstRdd) = cutPartitioned(
      arcs.repartition(shufflePartitions, col("dst")).sortWithinPartitions("dst"),
      Seq("dst"),
      shufflePartitions)
    byDst.count()
    // the loop reads only the two partitioned copies — the unordered
    // arc cache is redundant from here (a full third copy of the edge
    // list at 10⁷⁺ edges)
    arcsRdd.unpersist(blocking = false)

    def l1Normalize(raw: DataFrame, valueCol: String): DataFrame = {
      val total = raw.agg(sum(col(valueCol)).as("__t"))
      raw.crossJoin(broadcast(total))
        .select(col("node"), (col(valueCol) / col("__t")).as(valueCol))
    }

    var (hubs, hubsRdd) = cut(nodes.select(col("node"), lit(1.0 / n).as("hub")))
    hubs.count()
    var auths: DataFrame = null
    var authsRdd: org.apache.spark.rdd.RDD[InternalRow] = null

    var iter = 0
    // fixed round count, no convergence gate (the LPA discipline): the
    // auth/hub chain stays lazy and the final out.count() executes all
    // rounds as ONE job; intermediate caches release after it. Saves
    // 2·iterations driver jobs per call.
    val deferred = scala.collection.mutable.ListBuffer[
      org.apache.spark.rdd.RDD[InternalRow]]()
    while (iter < iterations) {
      val authRaw = bySrc
        .join(hubs.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub") * col("w")).as("authority"))
      val (nextA, nextARdd) = cut(l1Normalize(authRaw, "authority"))
      if (authsRdd != null) deferred += authsRdd
      auths = nextA
      authsRdd = nextARdd

      val hubRaw = byDst
        .join(auths.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("authority") * col("w")).as("hub"))
      val (nextH, nextHRdd) = cut(l1Normalize(hubRaw, "hub"))
      deferred += hubsRdd
      hubs = nextH
      hubsRdd = nextHRdd
      iter += 1
      // peak-storage bound (see pagerank): materialize every
      // deferralWindow deferred cuts and release them — the hubs chain
      // pulls the auths chain with it, so one count() clears both
      if (deferred.size >= deferralWindow) {
        hubs.count()
        deferred.foreach(_.unpersist(blocking = false))
        deferred.clear()
      }
    }

    val (out, _) = cut(
      nodes
        .join(auths, Seq("node"), "left")
        .join(hubs, Seq("node"), "left")
        .select(
          col("node"),
          coalesce(col("authority"), lit(0.0)).as("authority"),
          coalesce(col("hub"), lit(0.0)).as("hub")))
    out.count()
    deferred.foreach(_.unpersist(blocking = false))
    Seq(arcsRdd, nodesRdd, bySrcRdd, byDstRdd, authsRdd, hubsRdd)
      .foreach(_.unpersist(blocking = false))
    out
  }

  /** Driver HITS for broadcast-sized graphs: identical recurrence on
    * flat primitive arrays (the [[pagerankDriver]] contract). */
  private def hitsDriver(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      iterations: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val srcType = schema.fields(0).dataType
    val dstType = schema.fields(1).dataType
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    val es = rows.map(r =>
      (id(InternalRow.copyValue(r.get(0, srcType))),
        id(InternalRow.copyValue(r.get(1, dstType))),
        r.getDouble(2)))
    val n = idx.size
    var hub = Array.fill(n)(1.0 / n)
    var auth = new Array[Double](n)
    var iter = 0
    while (iter < iterations) {
      val a2 = new Array[Double](n)
      es.foreach { case (s, t, wt) => a2(t) += hub(s) * wt }
      val at = a2.sum
      var i = 0
      while (i < n) { a2(i) /= at; i += 1 }
      val h2 = new Array[Double](n)
      es.foreach { case (s, t, wt) => h2(s) += a2(t) * wt }
      val ht = h2.sum
      i = 0
      while (i < n) { h2(i) /= ht; i += 1 }
      auth = a2
      hub = h2
      iter += 1
    }
    val outSchema = StructType(Seq(
      schema.fields(0).copy(name = "node"),
      StructField("authority", DoubleType, nullable = false),
      StructField("hub", DoubleType, nullable = false)))
    val outRows = idx.toSeq.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, auth(i), hub(i))): InternalRow
    }
    Bridge.internalCreateDataFrame(
      spark,
      spark.sparkContext.parallelize(outRows, math.max(1, n / 500000)),
      outSchema)
  }

  /** Driver power iteration for broadcast-sized graphs: identical
    * recurrence, flat primitive arrays, zero per-round scheduling.
    * Operates on INTERNAL rows end to end (UTF8String keys in, internal
    * result rows out) so the gate pays no external-Row conversion. */
  private def pagerankDriver(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      iterations: Int,
      damping: Double,
      tol: Double,
      seedVals: Option[Array[Any]] = None,
      symmetrize: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val srcType = schema.fields(0).dataType
    val dstType = schema.fields(1).dataType
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    // primitive edge arrays (no per-arc tuple boxing — the index build
    // and the iteration folds are the driver lane's hot path at 10⁶
    // arcs); under symmetrize the mirrored arc follows its forward arc
    // immediately, matching an exploded frame's collect order
    val m = if (symmetrize) rows.length * 2 else rows.length
    val esS = new Array[Int](m)
    val esT = new Array[Int](m)
    val esW = new Array[Double](m)
    var j = 0
    rows.foreach { r =>
      val s = id(InternalRow.copyValue(r.get(0, srcType)))
      val t = id(InternalRow.copyValue(r.get(1, dstType)))
      val wt = r.getDouble(2)
      esS(j) = s; esT(j) = t; esW(j) = wt; j += 1
      if (symmetrize) { esS(j) = t; esT(j) = s; esW(j) = wt; j += 1 }
    }
    val n = idx.size
    require(n > 0, "pagerank over an empty edge list")
    val outW = new Array[Double](n)
    var e = 0
    while (e < m) { outW(esS(e)) += esW(e); e += 1 }
    // restart distribution (see the distributed path): uniform, or
    // 1/|S∩V| on present seeds — same arithmetic either way
    val sv = new Array[Double](n)
    seedVals match {
      case None => java.util.Arrays.fill(sv, 1.0 / n)
      case Some(vals) =>
        val present = vals.filter(idx.contains)
        require(present.nonEmpty, "pagerank restartNodes share no node with the edge list")
        val share = 1.0 / present.length
        present.foreach(v => sv(idx(v)) = share)
    }
    var rank = sv.clone()
    var iter = 0
    var done = false
    while (iter < iterations && !done) {
      val next = Array.tabulate(n)(i => (1.0 - damping) * sv(i))
      var dm = 0.0
      var i = 0
      while (i < n) { if (outW(i) == 0.0) dm += rank(i); i += 1 }
      e = 0
      while (e < m) {
        val s = esS(e)
        next(esT(e)) += damping * rank(s) * (esW(e) / outW(s))
        e += 1
      }
      i = 0
      while (i < n) { next(i) += damping * dm * sv(i); i += 1 }
      if (tol > 0) {
        var delta = 0.0
        i = 0
        while (i < n) { delta += math.abs(next(i) - rank(i)); i += 1 }
        if (delta < tol) done = true
      }
      rank = next
      iter += 1
    }
    val outSchema = StructType(Seq(
      schema.fields(0).copy(name = "node"),
      StructField("rank", DoubleType, nullable = false)))
    val outRows = idx.toSeq.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, rank(i))): InternalRow
    }
    Bridge.internalCreateDataFrame(
      spark,
      spark.sparkContext.parallelize(outRows, math.max(1, n / 500000)),
      outSchema)
  }

  /** SYNCHRONOUS label propagation (Raghavan et al. 2007) over the
    * undirected view of the edge list — community detection for
    * domain/host clustering on a crawl graph (which sites form a link
    * neighborhood), the unsupervised sibling of the
    * [[DedupDocs.connectedComponents]] equivalence classes (LPA splits
    * a connected component into densely-linked communities; CC cannot).
    *
    * Deterministic variant, chosen so an independent engine can replay
    * it: every node starts labeled with itself; each round, EVERY node
    * simultaneously takes the neighbor label with the greatest total
    * edge weight, ties to the bytewise smallest label (the asynchronous
    * coin-flip variant of the paper is not reproducible). Self-loops
    * are excluded (a node does not vote for itself); parallel edges
    * collapse by weight sum — multiplicity IS the vote weight. Fixed
    * `iterations` rounds: synchronous LPA can oscillate on bipartite
    * structures, so a fixed count (not convergence) is the contract,
    * and the oracle unrolls the same count.
    *
    * Float-weight caveat (both lanes, same as [[pagerank]]/[[hits]]):
    * per-round vote sums fold in an implementation-defined order — the
    * distributed lane's partial aggregation and the driver lane's flat
    * re-fold can differ in the last ulp for NON-INTEGRAL weights, so
    * a tie decided at that precision may pick a different label. For
    * integral multiplicity weights (the crawl-graph shape, and any
    * unweighted call) every sum is exact and the two lanes are
    * bit-identical (GraphSpec A/B).
    *
    * Execution shape: the symmetrized weighted arc list is exchanged
    * and sorted ONCE on the voting side with the layout declared to
    * Catalyst (the [[pagerank]]/[[hits]] loop contract) — each round
    * moves only the O(nodes) label vector into the join plus one
    * (node, label) vote combine, both bounded by the arc count, with
    * lineage cut per round.
    *
    * @return (node, label) after `iterations` rounds — nodes sharing a
    *         label are one community
    */
  /** Driver vote loop for broadcast-sized graphs: identical recurrence
    * (every node simultaneously takes the neighbor label with the
    * greatest total arc weight, ties to the SMALLEST label by the
    * type's ordering), over the same collapsed symmetric arc list the
    * distributed lane builds — the collapse sum runs in Spark either
    * way, so the driver lane only re-folds per-round vote sums (exact
    * for the integral multiplicity weights crawl graphs carry; float
    * sums are partition-order-dependent in the distributed lane too). */
  private def lpaDriver(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      iterations: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.StructType
    val aType = schema.fields(0).dataType
    val bType = schema.fields(1).dataType
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    val es = rows.map(r =>
      (id(InternalRow.copyValue(r.get(0, aType))),
        id(InternalRow.copyValue(r.get(1, bType))),
        r.getDouble(2)))
    val n = idx.size
    val nodeVals = idx.keys.toArray
    // Spark's ASC ordering for the label column: binary for strings
    // (UTF8String.compareTo), natural for numerics
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: org.apache.spark.unsafe.types.UTF8String,
            b: org.apache.spark.unsafe.types.UTF8String) => a.compareTo(b) < 0
      case (a: java.lang.Comparable[_], _) =>
        a.asInstanceOf[java.lang.Comparable[Any]].compareTo(y) < 0
      case _ => sys.error(s"unorderable label type: ${x.getClass}")
    }
    var labels: Array[Int] = Array.tabulate(n)(identity) // label = own node
    var iter = 0
    while (iter < iterations) {
      val votes = Array.fill(n)(
        scala.collection.mutable.HashMap.empty[Int, Double])
      es.foreach { case (a, b, wt) =>
        val m = votes(a)
        m(labels(b)) = m.getOrElse(labels(b), 0.0) + wt
      }
      val next = new Array[Int](n)
      var i = 0
      while (i < n) {
        var bestL = -1
        var bestV = Double.NegativeInfinity
        votes(i).foreach { case (l, v) =>
          if (v > bestV || (v == bestV && lt(nodeVals(l), nodeVals(bestL))))
            { bestL = l; bestV = v }
        }
        // every indexed node has ≥1 arc (idx is built from the arc
        // list), so bestL is always set
        next(i) = bestL
        i += 1
      }
      labels = next
      iter += 1
    }
    val outSchema = StructType(Seq(
      schema.fields(1).copy(name = "node"),
      schema.fields(1).copy(name = "label")))
    val outRows = nodeVals.zipWithIndex.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, nodeVals(labels(i)))): InternalRow
    }
    // the driver lane KNOWS the exact row count — hint the label table
    // broadcastable so consumers joining it (modularity's la/lb/deg
    // joins) skip the exchange+sort a stats-less parallelize frame
    // would otherwise plan; the distributed lane returns its cache
    // frame un-hinted
    graft.spikes.Spikes.broadcastIfSmall(
      Bridge.internalCreateDataFrame(
        spark,
        spark.sparkContext.parallelize(outRows.toSeq, math.max(1, n / 500000)),
        outSchema),
      n.toLong)
  }

  def labelPropagation(
      edges: DataFrame,
      iterations: Int = 3,
      weightCol: Option[String] = None,
      // broadcast-sized graphs run the vote rounds on the driver
      // (pagerank/hits precedent); the distributed lane is pinned in
      // scale benches via driverEdgeLimit = 0
      driverEdgeLimit: Long = 2000000L
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    val w = weightCol.map(col).getOrElse(lit(1.0)).cast("double")
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sym = edges
      .select(col("src").as("a"), col("dst").as("b"), w.as("w"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b"), w.as("w")))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(sum(col("w")).as("w"))
    // driver gate BEFORE the partitioned cache: the raw edge count (one
    // shuffle-free scan, symmetrized = 2×) bounds the collapsed arc
    // count from above, so a small corpus skips the repartition+sort
    // pass that only the loop needs. Conservative past the limit (the
    // bfsDistances contract): the distributed lane pays one extra scan.
    if (2 * edges.count() <= driverEdgeLimit) {
      val (nbr, nbrRdd) = cut(sym)
      val rows = nbrRdd.collect()
      nbrRdd.unpersist(blocking = false)
      return lpaDriver(spark, rows, nbr.schema, iterations)
    }
    val (nbr, nbrRdd) = cutPartitioned(
      sym.repartition(shufflePartitions, col("b")).sortWithinPartitions("b"),
      Seq("b"),
      shufflePartitions)

    var (labels, labelsRdd) = cut(
      nbr.select(col("b").as("node")).distinct().select(col("node"), col("node").as("label")))
    // LPA's round count is FIXED (no convergence gate to evaluate), so
    // unlike the count-gated loops (bfs/kcore/pagerank-with-tol) no
    // per-round driver action is needed: each round's cut RDD stays
    // lazy, the ONE materialization below executes all rounds as a
    // single job (each intermediate computes exactly once — it is
    // persisted, and stages consume it in dependency order), and the
    // intermediate label caches release afterwards. Saves
    // 2 + iterations driver jobs per call; identical work per round.
    val intermediates = scala.collection.mutable.ListBuffer[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]()

    import org.apache.spark.sql.expressions.Window
    val wArg = Window.partitionBy("node").orderBy(col("v").desc, col("label").asc)
    var iter = 0
    while (iter < iterations) {
      val votes = nbr
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(sum(col("w")).as("v"))
      val (next, nextRdd) = cut(
        votes
          .withColumn("__r", row_number().over(wArg))
          .where(col("__r") === 1)
          .select("node", "label"))
      intermediates += labelsRdd
      labels = next
      labelsRdd = nextRdd
      iter += 1
      // peak-storage bound (see pagerank): one checkpoint job per
      // deferralWindow rounds instead of one per round
      if (intermediates.size >= deferralWindow) {
        labels.count()
        intermediates.foreach(_.unpersist(blocking = false))
        intermediates.clear()
      }
    }
    labels.count() // materializes the whole round chain in one job
    intermediates.foreach(_.unpersist(blocking = false))
    nbrRdd.unpersist(blocking = false)
    labels
  }

  /** k-core of the UNDIRECTED simple view of an edge list: the maximal
    * subgraph in which every node keeps degree ≥ k — the
    * link-farm/spam-shell signal next to [[triangleCounts]] (a
    * mutual-citation farm survives deep cores; organically linked
    * pages shed early), and the standard "dense backbone" extractor.
    *
    * Iterative peeling: each round recomputes degrees over the
    * surviving induced subgraph and drops nodes below k — removals
    * CASCADE (a chain anchored on a dense core peels one link per
    * round). Rounds are bounded by `maxRounds` with an early stop once
    * a round removes nothing (one O(1) count per round, the same
    * count-gated loop discipline as [[pagerank]]); peeling is
    * monotone, so stopping at the fixpoint equals running all rounds —
    * the oracle unrolls the full `maxRounds` unconditionally.
    *
    * Execution shape: the canonical edge list is cached once
    * (lineage-cut); each round is two semi-joins of edges against the
    * O(nodes) alive vector plus one degree rollup — all equi-joins on
    * node keys, nothing driver-side but the per-round count.
    *
    * @return (node, core_degree) for nodes in the k-core after at most
    *         `maxRounds` peels — core_degree is the node's degree
    *         WITHIN the surviving subgraph (≥ k at the fixpoint)
    */
  /** Multi-source BFS hop distances over a DIRECTED edge list: every
    * node reachable from any seed within `maxHops`, with its MINIMUM
    * hop count — link-distance-from-seed-set (crawl frontier depth,
    * "how far is this page from the trusted seed list", contamination
    * blast radius through a citation graph).
    *
    * Level-synchronous frontier expansion — the textbook distributed
    * BFS: each round is ONE equi-join (frontier ⋈ edges on src) + a
    * distinct + an anti-join against the visited set, all hash
    * exchanges on node ids; per-round frames go through the
    * [[graft.util.LoopFrames]] lineage cut so round k's plan is a scan
    * of round k−1's RDD, not a 2^k-join re-analysis. A node is final
    * the first time it enters `visited` (BFS invariant: first arrival
    * = min hops), so rounds never revisit — each edge is traversed at
    * most once per incident frontier membership, O(m) total work
    * across the loop. The loop is count-gated (stop on empty
    * frontier) and bounded by `maxHops`.
    *
    * Semantics (mirrored by the recursive-CTE DuckDB oracle): directed
    * edges, unit hop cost, NULL endpoints dropped, seeds at distance 0
    * (seeds not present in the edge list still report), min over all
    * paths ≤ maxHops.
    *
    * @return (node, dist) — one row per reached node
    */
  /** Driver level-synchronous BFS for broadcast-sized graphs: identical
    * frontier/visited semantics as the distributed lane (seeds at 0,
    * first arrival = min hops, stop on empty frontier or maxHops), flat
    * int adjacency. All-integer arithmetic — exact parity. */
  private def bfsDriver(
      spark: org.apache.spark.sql.SparkSession,
      edgeRows: Array[InternalRow],
      edgeSchema: org.apache.spark.sql.types.StructType,
      seedVals: Array[Any],
      maxHops: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val srcType = edgeSchema.fields(0).dataType
    val dstType = edgeSchema.fields(1).dataType
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    // seeds first so ALL seeds (present in the edge list or not) are
    // indexed and report dist 0, matching the distributed union
    seedVals.foreach(id)
    val es = edgeRows.map(r =>
      (id(InternalRow.copyValue(r.get(0, srcType))),
        id(InternalRow.copyValue(r.get(1, dstType)))))
    val n = idx.size
    val adjHead = Array.fill(n)(-1)
    val adjNext = new Array[Int](es.length)
    val adjDst = new Array[Int](es.length)
    var ei = 0
    while (ei < es.length) {
      val (s, t) = es(ei)
      adjDst(ei) = t; adjNext(ei) = adjHead(s); adjHead(s) = ei
      ei += 1
    }
    val dist = Array.fill(n)(-1)
    var frontier = seedVals.map(idx(_)).distinct
    frontier.foreach(i => dist(i) = 0)
    var hop = 0
    while (frontier.nonEmpty && hop < maxHops) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Int]
      frontier.foreach { u =>
        var e = adjHead(u)
        while (e >= 0) {
          val v = adjDst(e)
          if (dist(v) < 0) { dist(v) = hop + 1; next += v }
          e = adjNext(e)
        }
      }
      frontier = next.toArray
      hop += 1
    }
    val nodeField = edgeSchema.fields(1).copy(name = "node")
    val outSchema = StructType(Seq(
      nodeField, StructField("dist", IntegerType, nullable = false)))
    val outRows = idx.toSeq.collect {
      case (v, i) if dist(i) >= 0 =>
        new GenericInternalRow(Array[Any](v, dist(i))): InternalRow
    }
    Bridge.internalCreateDataFrame(
      spark,
      spark.sparkContext.parallelize(outRows, math.max(1, n / 500000)),
      outSchema)
  }

  def bfsDistances(
      edges: DataFrame,
      sources: DataFrame,
      maxHops: Int,
      // broadcast-sized graphs skip the frontier loop (pagerank/hits
      // driverEdgeLimit precedent): each distributed round is a join +
      // distinct + anti-join + union + count — per-round stage overhead
      // that dwarfs the work on a graph fitting one driver array. Hop
      // counts are integers, so parity is exact (GraphSpec A/B-pinned).
      driverEdgeLimit: Long = 2000000L
  ): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val cleanEdges = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val srcNodeType = sources.select(col("node")).schema.fields(0).dataType
    // driver gate BEFORE the partitioned cache is built: the gate reads
    // the RAW (pre-distinct) count — one shuffle-free map-side scan —
    // so the driver lane never pays the repartition+sort pass that only
    // the loop needs. Conservative: a corpus whose raw edge list
    // exceeds the limit but whose distinct list would fit takes the
    // distributed lane — both lanes are exact, so only the constant
    // differs; the scale lane's cost is one extra scan of the edge
    // frame, a few percent of the loop it guards. Type equality guards
    // the value-identity of the collected seed keys against the edge
    // endpoints (mixed-width ids fall back to the distributed lane,
    // which widens via the union).
    if (srcNodeType == cleanEdges.schema.fields(1).dataType &&
        // mixed-width EDGE schemas (e.g. int src, long dst) must also
        // fall back: bfsDriver compares boxed keys, and an int-boxed
        // src never equals a long-boxed dst even for the same id —
        // the distributed lane's SQL coercion widens instead
        // (ADVICE r18)
        cleanEdges.schema.fields(0).dataType == cleanEdges.schema.fields(1).dataType &&
        cleanEdges.count() <= driverEdgeLimit) {
      val (d, dRdd) = cut(cleanEdges.distinct())
      val seedVals = Bridge.toInternalRdd(
          sources.select(col("node")).where(col("node").isNotNull).distinct())
        .map(_.copy()).collect()
        .map(r => InternalRow.copyValue(r.get(0, srcNodeType)))
      val rows = dRdd.collect()
      dRdd.unpersist(blocking = false)
      return bfsDriver(edges.sparkSession, rows, d.schema, seedVals, maxHops)
    }
    // the (big, static) edge side is exchanged and sorted ONCE with a
    // DECLARED hash layout on src — every round's frontier join then
    // plans no Exchange and no Sort under the edge scan; only the
    // (small) frontier moves per round (the pagerank matrix recipe)
    val shufflePartitions =
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val (e, eRdd) = cutPartitioned(
      cleanEdges
        .distinct()
        .repartition(shufflePartitions, col("src"))
        .sortWithinPartitions("src"),
      Seq("src"),
      shufflePartitions)
    e.count()
    var (visited, visitedRdd) = cut(
      sources.select(col("node")).where(col("node").isNotNull).distinct()
        .withColumn("dist", lit(0)))
    var visitedCount = visited.count()
    var frontier = visited.select("node")
    var frontierRdd: org.apache.spark.rdd.RDD[InternalRow] = null
    var hop = 0
    var done = maxHops == 0
    while (!done) {
      val (next, nextRdd) = cut(
        frontier.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(hop + 1)))
      // ONE action per round: materializing the union also yields the
      // frontier-empty gate (anti-join guarantees next ∩ visited = ∅,
      // so |nv| − |visited| IS |next|)
      val (nv, nvRdd) = cut(visited.unionAll(next))
      val nvCount = nv.count()
      if (nvCount == visitedCount) {
        nextRdd.unpersist(blocking = false)
        nvRdd.unpersist(blocking = false)
        done = true
      } else {
        visitedRdd.unpersist(blocking = false)
        // the PREVIOUS frontier's cache can go now; `next` stays
        // persisted — it is the next round's frontier
        if (frontierRdd != null) frontierRdd.unpersist(blocking = false)
        visited = nv
        visitedRdd = nvRdd
        visitedCount = nvCount
        frontier = next.select("node")
        frontierRdd = nextRdd
        hop += 1
        done = hop >= maxHops
      }
    }
    if (frontierRdd != null) frontierRdd.unpersist(blocking = false)
    eRdd.unpersist(blocking = false)
    // `visited` stays persisted (the kCore convention: the returned
    // plan reads it; the session releases storage between pipelines)
    visited
  }

  /** Driver peel loop for broadcast-sized graphs: the IDENTICAL
    * round/fixpoint semantics as the distributed lane (alive₀ = degree
    * ≥ k over the full simple graph; each of rounds 1..maxRounds−1
    * recomputes INDUCED degrees and drops < k, stopping early when a
    * round removes nothing; result = induced degrees over the final
    * alive set), in flat int arrays. All-integer arithmetic — parity
    * with the distributed lane is exact, not approximate. */
  private def kCoreDriver(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      k: Int,
      maxRounds: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val aType = schema.fields(0).dataType
    val bType = schema.fields(1).dataType
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    val es = rows.map(r =>
      (id(InternalRow.copyValue(r.get(0, aType))),
        id(InternalRow.copyValue(r.get(1, bType)))))
    val n = idx.size
    def inducedDegrees(alive: Array[Boolean]): Array[Long] = {
      val deg = new Array[Long](n)
      es.foreach { case (a, b) =>
        if (alive == null || (alive(a) && alive(b))) { deg(a) += 1; deg(b) += 1 }
      }
      deg
    }
    var alive = inducedDegrees(null).map(_ >= k)
    var aliveCount = alive.count(identity)
    var round = 1
    var done = false
    while (round < maxRounds && !done) {
      val deg = inducedDegrees(alive)
      val next = Array.tabulate(n)(i => alive(i) && deg(i) >= k)
      val m = next.count(identity)
      if (m == aliveCount) done = true
      else { alive = next; aliveCount = m }
      round += 1
    }
    val finalDeg = inducedDegrees(alive)
    val outSchema = StructType(Seq(
      schema.fields(0).copy(name = "node"),
      StructField("core_degree", LongType, nullable = false)))
    // the distributed lane's final rollup emits a row only for nodes
    // incident to a surviving induced edge (degree ≥ 1)
    val outRows = idx.toSeq.collect {
      case (v, i) if alive(i) && finalDeg(i) >= 1 =>
        new GenericInternalRow(Array[Any](v, finalDeg(i))): InternalRow
    }
    Bridge.internalCreateDataFrame(
      spark,
      spark.sparkContext.parallelize(outRows, math.max(1, n / 500000)),
      outSchema)
  }

  def kCore(
      edges: DataFrame,
      k: Int,
      maxRounds: Int = 20,
      // broadcast-sized graphs skip the peel loop's per-round scheduling
      // (the pagerank/hits driverEdgeLimit precedent): up to maxRounds
      // rounds of two semi-joins + a rollup + a count over a graph that
      // fits one driver array is pure stage overhead. The peel itself is
      // INTEGER arithmetic (degree counts), so driver/distributed parity
      // is exact — pinned by GraphSpec's fast-path/distributed A/B.
      driverEdgeLimit: Long = 2000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (und, undRdd) = cut(
      edges
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
        .distinct())
    val nUnd = und.count()
    if (nUnd <= driverEdgeLimit) {
      val rows = undRdd.collect()
      undRdd.unpersist(blocking = false)
      return kCoreDriver(edges.sparkSession, rows, und.schema, k, maxRounds)
    }
    def degrees(alive: Option[DataFrame]): DataFrame = {
      val kept = alive match {
        case Some(av) =>
          und
            .join(av.select(col("node").as("a")), Seq("a"), "left_semi")
            .join(av.select(col("node").as("b")), Seq("b"), "left_semi")
        case None => und
      }
      kept.select(col("a").as("node"))
        .unionAll(kept.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("core_degree"))
    }
    var (alive, aliveRdd) = cut(
      degrees(None).where(col("core_degree") >= k).select("node"))
    var n = alive.count()
    var round = 1
    var done = false
    while (round < maxRounds && !done) {
      val (next, nextRdd) = cut(
        degrees(Some(alive)).where(col("core_degree") >= k).select("node"))
      val m = next.count()
      if (m == n) {
        nextRdd.unpersist(blocking = false)
        done = true
      } else {
        aliveRdd.unpersist(blocking = false)
        alive = next
        aliveRdd = nextRdd
        n = m
      }
      round += 1
    }
    // materialize (via the same lineage cut) before dropping the
    // caches the final plan reads from
    val (res, _) = cut(degrees(Some(alive)).join(alive, Seq("node"), "left_semi"))
    res.count()
    aliveRdd.unpersist(blocking = false)
    undRdd.unpersist(blocking = false)
    res
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * UNDIRECTED view of an edge list — the link-farm / mutual-citation
    * density signal a crawl-quality prior reads next to [[pagerank]]
    * (a domain whose neighborhood is a near-clique is a different
    * beast from a hub with the same degree).
    *
    * Degree-ordered node-iterator (Suri & Vassilvitskii 2011, "the
    * curse of the last reducer"): each canonical edge is oriented from
    * its lower-(degree, id) endpoint to the higher, so every wedge is
    * enumerated at its LOWEST-rank vertex — out-degrees are bounded by
    * O(√m) on any graph, which caps the one super-linear step (the
    * wedge self-join) at O(m^1.5) total and, critically, breaks up the
    * hub rows: a 10M-degree hub node enumerates ZERO wedges (every
    * incident edge points INTO it) instead of 10M² candidate pairs.
    * Each triangle is found exactly once (wedge center = min-rank
    * vertex, closed against the canonical edge set). Everything is an
    * equi-join on node keys — no loop, no driver state, 100 TB shape.
    *
    * Semantics (mirrored literally by the DuckDB oracle): parallel
    * edges collapse, direction and weights are ignored, self-loops are
    * dropped; `lcc = 2·T(v) / (deg(v)·(deg(v)−1))`, 0 when deg < 2,
    * rounded to 6dp on both sides.
    *
    * @return (node, degree, n_triangles, lcc)
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // und is scanned ~5 times (degrees, orientation, closure) and deg
    // 3 times — cut both once so the caller's upstream pipeline (often
    // a full extraction chain) runs exactly once, not per reference
    val (und, undRdd) = cut(
      edges
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
        .distinct())
    val (deg, degRdd) = cut(
      und.select(col("a").as("v"))
        .unionAll(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d")))
    // no intermediate count() barriers: the final materialization
    // below computes-and-persists both cut RDDs on first use
    // orient low-(degree, id) → high: rank ties broken by node id so
    // the orientation is a strict total order (acyclic by construction)
    val o = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
    val o2 = o.select(col("lo"), col("hi").as("hi2"))
    val wedges = o.join(o2, "lo")
      .where(col("hi") < col("hi2"))
      .select(col("lo").as("c"), col("hi").as("x"), col("hi2").as("y"))
    val tris = wedges.join(
      und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    val perNode = tris
      .select(explode(array(col("c"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("nt"))
    val out = deg.join(perNode, Seq("v"), "left")
      .select(
        col("v").as("node"),
        col("d").as("degree"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"),
        round(
          when(col("d") >= 2,
            lit(2.0) * coalesce(col("nt"), lit(0L)).cast("double") /
              (col("d").cast("double") * (col("d").cast("double") - 1.0)))
            .otherwise(lit(0.0)),
          6).as("lcc"))
    // materialize (lineage-cut) before releasing the shared caches
    val (res, _) = cut(out)
    res.count()
    undRdd.unpersist(blocking = false)
    degRdd.unpersist(blocking = false)
    res
  }

  /** Default citing-set cap per source for [[coCitation]] — a page
    * linking more than this many targets is a hub/boilerplate page
    * whose co-citation signal is noise, and its pair cost is
    * quadratic; shed it (logged via [[coCitationShed]]). Link-analysis
    * practice caps out-degree anyway (Kleinberg's HITS root sets,
    * SALSA samplers). */
  val DefaultMaxCite = 256

  /** Co-citation similarity (Small 1973): two targets are related when
    * the SAME sources link both — "related domains/papers/products"
    * from nothing but the link structure, the dual of the
    * shared-out-link coupling measure. Output per unordered target
    * pair (dst_a < dst_b bytewise): `n_common` (distinct sources
    * citing both) and each side's total citing in-degree `deg_a` /
    * `deg_b` — INTEGER counts only (cosine/Jaccard are one stateless
    * division away; shipping them pre-divided would put a float
    * boundary between engines). Pairs with `n_common < minCommon` are
    * dropped (the long noise tail IS the output bulk otherwise).
    *
    * Plan: distinct edge dedup → ONE source-key exchange gathering
    * each source's citing set through the saturating capped-set kernel
    * (sources over `maxCite` targets shed map-side, O(1) memory) →
    * within-bucket posexplode pair explode → one map-side-combinable
    * pair rollup → in-degree join. The exchange volume is bounded by
    * edges and surviving pairs — never an all-pairs product; a hub
    * source can no longer pin one task.
    */
  def coCitation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      minCommon: Long = 2L,
      maxCite: Int = DefaultMaxCite
  ): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    // e is referenced twice (citing-set gather + in-degree rollup) —
    // cut it so the caller's upstream extraction runs once
    val (e, eRdd) = cut(
      edges
        .select(col(srcCol).cast("string").as("__s"), col(dstCol).cast("string").as("__d"))
        .where(col("__s").isNotNull && col("__d").isNotNull)
        .distinct())
    val buckets = e
      .groupBy("__s")
      .agg(graft.functions.CappedStringSet.cappedStringSet(col("__d"), maxCite).as("docs"))
      .where(col("docs").isNotNull && size(col("docs")) > 1)
    val common = DedupDocs
      .explodePairs(buckets)
      .groupBy(col("doc_a").as("dst_a"), col("doc_b").as("dst_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
    val indeg = e.groupBy(col("__d")).agg(count(lit(1)).as("__deg"))
    val out = common
      .join(indeg.toDF("dst_a", "deg_a"), "dst_a")
      .join(indeg.toDF("dst_b", "deg_b"), "dst_b")
      .select("dst_a", "dst_b", "n_common", "deg_a", "deg_b")
    val (res, _) = cut(out)
    res.count()
    eRdd.unpersist(blocking = false)
    res
  }

  /** Shed diagnostic for [[coCitation]]: sources whose citing set
    * exceeded `maxCite` distinct targets, with TRUE counts —
    * count-only, safe at any scale; empty ⇒ the capped run was
    * exact. */
  def coCitationShed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxCite: Int = DefaultMaxCite
  ): DataFrame =
    edges
      .select(col(srcCol).cast("string").as("source"), col(dstCol).cast("string").as("__d"))
      .where(col("source").isNotNull && col("__d").isNotNull)
      .distinct()
      .groupBy("source")
      .agg(count(lit(1)).as("n_targets"))
      .where(col("n_targets") > maxCite)

  /** Newman modularity of a node partition over the UNDIRECTED
    * weighted view of an edge list (Newman & Girvan 2004) — the
    * quality readout for [[labelPropagation]]'s communities (LPA gives
    * you labels; modularity tells you whether they mean anything):
    *
    *   Q = Σ_c ( e_c / 2m − (d_c / 2m)² )
    *
    * computed per community in the cleared form
    * `(e2_c·S − d_c²) / S²` with S = 2m = Σ_sym w, e2_c = intra-
    * community symmetrized weight (each undirected edge twice), d_c =
    * community degree sum. Integral edge weights stay EXACT in
    * doubles (every sum is a sum of integers < 2⁵³), so both engines
    * walk identical arithmetic in any order.
    *
    * Shape at scale: the symmetrized rollup is the corpus-sized step
    * (same exchange as LPA's `sym`); everything after rides frames
    * bounded by nodes and labels — degrees, the label joins (labels
    * broadcast), and the per-community rollup. S attaches as an
    * unpartitioned window over the bounded node frame, never a second
    * scan.
    *
    * Output per community: label, n_nodes, d_sum, e_intra2, contrib
    * (8dp), q (6dp, the partition total — identical on every row). */
  def modularity(
      edges: DataFrame,
      labels: DataFrame,
      weightCol: Option[String] = None
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = weightCol.map(col).getOrElse(lit(1.0)).cast("double")
    // the corpus-sized symmetrized rollup feeds THREE subtrees (deg,
    // intra's two label joins); persisted so it computes once instead of
    // re-running the whole upstream edge pipeline per consumer. The
    // returned plan still reads it → CacheRegistry lifetime (released
    // between pipelines), the Mixture/Lm convention.
    val sym = graft.util.CacheRegistry.track(
      edges
        .select(col("src").as("a"), col("dst").as("b"), w.as("w"))
        .unionAll(edges.select(col("dst").as("a"), col("src").as("b"), w.as("w")))
        .where(col("a") =!= col("b"))
        .groupBy("a", "b")
        .agg(sum(col("w")).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val deg = sym
      .groupBy(col("a").as("node"))
      .agg(sum(col("w")).as("d"))
      .withColumn("__s", sum(col("d")).over(whole))
    val dc = deg
      .join(labels, "node")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("d_sum"), max(col("__s")).as("__s"))
    val la = labels.select(col("node").as("a"), col("label").as("__la"))
    val lb = labels.select(col("node").as("b"), col("label").as("__lb"))
    val intra = sym
      .join(la, "a")
      .join(lb, "b")
      .where(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label"))
      .agg(sum(col("w")).as("e_intra2"))
    val contrib =
      (col("e_intra2") * col("__s") - col("d_sum") * col("d_sum")) / (col("__s") * col("__s"))
    dc
      // gated broadcast instead of r18's unconditional hint (ADVICE
      // r18): intra is O(communities) ≤ O(label rows), so one
      // shuffle-free count of the labels frame bounds it — a
      // degenerate label = node-id labeling on a big graph keeps the
      // sort-merge lane instead of forcing a driver-sized broadcast.
      // The count is a scan of a frame the plan already reads three
      // times (dc/la/lb), and the hint stays LAZY — no extra
      // materialization job for the sym rollup (a limit-probe collect
      // here measured +0.18 s: it serializes the cache fill into its
      // own job where the single noop action pipelines it)
      .join(graft.spikes.Spikes.broadcastIfSmall(intra, labels.count()),
        Seq("label"), "left")
      .withColumn("e_intra2", coalesce(col("e_intra2"), lit(0.0)))
      .withColumn("__c", contrib)
      .withColumn("q", round(sum(col("__c")).over(whole), 6))
      .select(
        col("label"), col("n_nodes"), col("d_sum"), col("e_intra2"),
        round(col("__c"), 8).as("contrib"), col("q"))
  }
}
