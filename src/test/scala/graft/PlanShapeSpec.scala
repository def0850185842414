package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan shape assertions: the scale properties COVERAGE.md
  * claims are checked here against the actual executed plans, so a
  * regression (lost pushdown, surprise nested-loop join, missed
  * broadcast, un-pruned scan) fails CI — not a 100 TB run.
  *
  * Queries run on sf0.001 — plan shape, not data volume, is under test.
  */
class PlanShapeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan
  }

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = executed(df)
    // include AQE sub-plans
    stripAQEPlan(plan).toString + "\n" + plan.toString
  }

  test("no BroadcastNestedLoopJoin in ANY declared query (one pinned exception)") {
    // Two deliberate cross joins of a broadcast-tiny side:
    //  - q_sim_topk is brute force BY DEFINITION (corpus × broadcast
    //    query set — the baseline the IVF path is measured against);
    //  - q_ivf_topk / q_ivf_serve cross-join queries × centroids
    //    (|q| × nLists rows) to rank cells;
    //  - q_pq_topk cross-joins the corpus CODES table with the
    //    broadcast per-query LUT set (the ADC scan — every code row is
    //    scored against every query by design, at m lookups per pair);
    //    its rerank joins are hash joins. q_ivfpq_topk replaces even
    //    that with a hash join on cell (asserted below).
    // Every other plan must be nested-loop-free.
    //  - q_sq8_topk is the same brute-force baseline over the int8-
    //    quantized table (corpus × broadcast quantized query set).
    // r13: q_hybrid_rrf (dense side now the IVF retriever) and
    // q_hard_negatives (candidates now via Ivf.hardNegativesIndexed's
    // cell join, label inequality per bucket) left this list — their
    // plans are asserted BNLJ-free below.
    //  - q_knn_graph reuses q_sim_topk's brute-force scorer over the
    //    bounded node subset (exact mutual-kNN is all-pairs BY
    //    DEFINITION; the mutual join itself is asserted hash below)
    val allowed = Set(
      "q_sim_topk", "q_ivf_topk", "q_ivf_serve", "q_pq_topk", "q_sq8_topk",
      "q_knn_graph")
    SparkEntry.queries.keys.toSeq.sorted.filterNot(allowed).foreach { name =>
      val p = planString(name)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name has a BNLJ:\n$p")
    }
    // and the exception stays what it is: the heavy candidate join in
    // the IVF queries is a hash join on cell
    assert(planString("q_ivf_topk").contains("BroadcastHashJoin"))
    assert(planString("q_ivf_serve").contains("BroadcastHashJoin"))
    // IVF-PQ's probed-cell ADC join is likewise a hash join on cell —
    // BNLJ-free end to end
    assert(planString("q_ivfpq_topk").contains("BroadcastHashJoin"))
    // r13: the two queries that LEFT the allowlist score candidates
    // through the IVF cell hash-join
    assert(planString("q_hard_negatives").contains("BroadcastHashJoin"))
    assert(planString("q_hybrid_rrf").contains("BroadcastHashJoin"))
    // r15: q_knn_graph's mutual-direction join is an equi hash/merge
    // join on (a, b) — only the scorer is the pinned brute-force BNLJ
    val knn = planString("q_knn_graph")
    assert(knn.contains("HashJoin") || knn.contains("SortMergeJoin"),
      s"mutual-kNN direction join must be an equi join:\n$knn")
  }

  test("q_dedup_incremental broadcasts the BATCH side — the corpus index never shuffles") {
    // the 100 TB property of IncrementalDedup.screen: the index-vs-batch
    // join must be a BroadcastHashJoin whose BUILD side is the batch's
    // band keys, leaving the (at scale, huge) index as the streamed
    // probe side with no Exchange under it
    val p = planString("q_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast join:\n$p")
    // the inner index-probe join builds right (the broadcast batch keys)
    assert(p.contains("BroadcastHashJoin [band") && p.contains("BuildRight"),
      s"index join must build on the broadcast batch side:\n$p")
    assert(!p.contains("SortMergeJoin [band"),
      s"the (band, band_key) join must never sort-merge (index-side shuffle):\n$p")
  }

  test("q_lm_score scores through a broadcast join — the token stream never shuffles for the vocab") {
    // the 100 TB property of Lm.lmScore: the vocabulary side (collected
    // to a local relation when count-gated small) must broadcast, so
    // the only exchange over the token stream is the map-side-combined
    // per-doc aggregate. A SortMergeJoin here would shuffle every token
    // occurrence by token value.
    val p = planString("q_lm_score")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast scoring join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream must not shuffle for the vocab join:\n$p")
  }

  test("q_dup_spans: gram exchange on fixed-width digest keys, dup set broadcast back") {
    // dupSpans's semi-join of positions against the duplicated-gram set
    // must broadcast the (small, duplication-rate-sized) dup set — a
    // sort-merge semi-join would re-shuffle every gram occurrence.
    val p = planString("q_dup_spans")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected a broadcast semi-join against the dup-gram set:\n$p")
    assert(!p.contains("SortMergeJoin"), s"positions must not shuffle for the semi-join:\n$p")
  }

  test("q_ivf_serve scans a cell-partitioned index with a static probed-cell partition filter") {
    // the serving join's corpus side must be the partitionBy("cell")
    // parquet index scanned under a static `cell IN (probed...)` filter
    // (Ivf.topKIndexed pruneIndexScan): at corpus scale that is the
    // difference between reading nProbe/nLists of the index and all of
    // it. DPP is deliberately NOT relied on — its broadcast-reuse
    // heuristic demotes the filter to a no-op literal at serving scale.
    val df = SparkEntry.queries("q_ivf_serve")(spark, dir)
    val plan = executed(df)
    val scans = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(plan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("assigned.parquet")) => f
      }
    assert(scans.nonEmpty, "no parquet index scan found in q_ivf_serve")
    assert(
      scans.exists(_.partitionFilters.exists(_.toString.toLowerCase.contains("cell"))),
      s"index scan has no cell partition filter: ${scans.map(_.partitionFilters).mkString(";")}")
  }

  test("q_bm25_serve probes a bucket-partitioned postings index: static partition filter + pushed tok predicate") {
    // the serving probe must touch only the query terms' hash buckets
    // (static `bucket IN (...)` computed driver-side via Bm25.termBucket)
    // and push `tok IN (...)` into the surviving files' row groups — at
    // corpus scale that is the difference between reading |q| buckets of
    // postings and the whole inverted index
    val df = SparkEntry.queries("q_bm25_serve")(spark, dir)
    val plan = executed(df)
    val scans = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(plan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("postings")) => f
      }
    assert(scans.nonEmpty, "no postings scan found in q_bm25_serve")
    assert(
      scans.exists(_.partitionFilters.exists(_.toString.toLowerCase.contains("bucket"))),
      s"postings scan has no bucket partition filter: ${scans.map(_.partitionFilters).mkString(";")}")
    assert(
      scans.exists(_.metadata.get("PushedFilters").exists(_.contains("In(tok"))),
      s"tok IN predicate not pushed to the postings scan: ${scans.map(_.metadata.get("PushedFilters")).mkString(";")}")
  }

  test("no CartesianProduct in ANY declared query") {
    // even the deliberate tiny cross joins must broadcast (BNLJ), never
    // fall to a shuffled CartesianProductExec
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = planString(name)
      assert(!p.contains("CartesianProduct"), s"$name has a CartesianProduct:\n$p")
    }
  }

  test("TPC-H-shaped joins broadcast their dimension sides") {
    val p3 = planString("q3_revenue")
    assert(p3.contains("BroadcastHashJoin"), p3)
    val p5 = planString("q5_nation")
    assert(p5.contains("BroadcastHashJoin"), p5)
  }

  test("q6 filter is pushed down to the parquet scan") {
    val p = planString("q6_forecast")
    assert(p.contains("PushedFilters:"), p)
    // the shipdate/discount/quantity predicates must reach the scan
    assert(
      p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"),
      p
    )
  }

  test("doc queries scan only the columns they use") {
    // q_dedup_exact touches doc_id + text only; documents also has
    // source and other metadata which must be pruned at the scan
    val df = SparkEntry.queries("q_dedup_exact")(spark, dir)
    val scans = collectWithSubqueries(executed(df)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val cols = s.requiredSchema.fieldNames.toSet
      assert(!cols.contains("source"), s"unpruned scan: $cols")
    }
  }

  test("patch extraction probes a broadcast hash relation") {
    val p = planString("q_patch_extract")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("patch extraction degrades to a shuffled equi-join when the peak side exceeds the broadcast threshold") {
    import org.apache.spark.sql.functions._
    val samples = spark.range(2000).select(col("id").as("idx"), (col("id") % 97).cast("double").as("v"))
    val peaks = spark.range(0, 2000, 10).select(col("id").as("idx"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val expected =
      try {
        spark.conf.set(key, (1024 * 1024).toString)
        val df = graft.spikes.Spikes.extractPatches(samples, peaks, "idx", "v", halfWidth = 2)
        assert((stripAQEPlan(executed(df)).toString + df.queryExecution.executedPlan.toString)
          .contains("BroadcastHashJoin"))
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      } finally spark.conf.set(key, saved)
    try {
      // threshold 0 → guard refuses the broadcast AND Spark's own
      // auto-broadcast is off: the fallback plan must be a plain
      // shuffled equi-join on __join_idx, never a nested loop — and the
      // rows must be identical to the broadcast plan's
      spark.conf.set(key, "0")
      val df = graft.spikes.Spikes.extractPatches(samples, peaks, "idx", "v", halfWidth = 2)
      val p = stripAQEPlan(executed(df)).toString + df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == expected)
    } finally spark.conf.set(key, saved)
  }

  test("q_funnel: exactly ONE user-key exchange + the final O(steps) singleton") {
    // the COVERAGE claim for Funnel.conversion: the k chained window
    // passes and the per-user rollup all ride one user-hash Exchange;
    // the only other exchange is the O(steps) global count. A Catalyst
    // change that re-shuffles per step would show up as extra
    // hashpartitioning exchanges here.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q_funnel")(spark, dir)
    val plan = executed(df)
    val exchanges = collect(plan) { case e: ShuffleExchangeExec => e }
    val parts = exchanges.map(_.outputPartitioning.toString)
    assert(parts.count(_.contains("hashpartitioning")) == 1,
      s"expected ONE user-hash exchange, got $parts:\n$plan")
    assert(parts.count(_.contains("SinglePartition")) == 1,
      s"expected ONE singleton count exchange, got $parts:\n$plan")
    assert(exchanges.size == 2, s"unexpected extra exchanges: $parts\n$plan")
  }

  test("keyed sessionize shuffles once on the key, no global sort") {
    val df = SparkEntry.queries("q_user_sessions")(spark, dir)
    val plan = executed(df)
    val str = stripAQEPlan(plan).toString + plan.toString
    // a keyless global Sort (Exchange SinglePartition) would be the
    // single-task cliff; the keyed plan must not have one
    assert(!str.contains("SinglePartition"), str)
  }

  test("q_seasonal scores through a broadcast profile join — the event stream never shuffles for it") {
    // the 100 TB property of Seasonal.score: the (keys × phases)
    // profile frame is tiny by construction; it must broadcast so the
    // only exchange over the event side is the profile rollup itself.
    // A SortMergeJoin here would shuffle every event by (key, phase).
    val p = planString("q_seasonal")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast profile join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"event side must not shuffle for the profile:\n$p")
  }

  test("q_fk_orphans probes distinct parent keys through a hash join, child side unshuffled when broadcastable") {
    val p = planString("q_fk_orphans")
    assert(p.contains("HashJoin"), s"expected a hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_ewma plans exactly ONE window pass (the r16 single-window fold)") {
    // the 100 TB property restored in r16: the prior smoothed value is
    // recomputed from lags 1..taps INSIDE the one window — the
    // lag(__ewma_micro, 1) spelling planned a SECOND WindowExec that
    // re-buffered every corpus row (measured 17.1 s vs 4.5 s at 10M
    // rows, tools/EwmaProbe). Guard the count so the fold can't
    // silently regress.
    val df = SparkEntry.queries("q_ewma")(spark, dir)
    val plan = executed(df)
    val windows = stripAQEPlan(plan).collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1, s"expected exactly one WindowExec, got ${windows.size}:\n$plan")
  }

  test("q_isotonic_score serves through a broadcast join — the scored corpus never shuffles") {
    // the serve lane's 100 TB property: the fitted step table is
    // bounded by the 4dp score vocabulary and must broadcast; a
    // SortMergeJoin would shuffle every scored row by score bucket.
    val p = planString("q_isotonic_score")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast serve join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle for the steps:\n$p")
  }

  test("link-graph extraction runs on the native URL kernels, not the regex chains (r17)") {
    // the r17 extraction-floor cut: href scan + href resolve +
    // registrable-domain must plan as the single-pass kernels
    // (href_values / resolve_href / url_registrable_domain); the
    // regex spellings cost ~1.5 s × 8 graph queries per bench pass
    // (r16 ModularityCostSplit) and are retained only as test twins.
    // A revert (e.g. an innocent refactor calling the *Cols twins)
    // shows up as regexp_extract in these plans.
    Seq("q_link_graph", "q_anchor_text").foreach { name =>
      val p = planString(name)
      assert(p.contains("url_registrable_domain"), s"$name lost the domain kernel:\n$p")
      assert(p.contains("resolve_href"), s"$name lost the resolve kernel:\n$p")
    }
    // q_link_graph's whole chain is kernel-native — zero regex ops in
    // the plan (q_anchor_text legitimately keeps the <a>…</a> anchor
    // regex + tag strip; only its resolve/domain legs are kernels)
    val lg = planString("q_link_graph")
    assert(lg.contains("href_values"), "q_link_graph lost the href-scan kernel")
    assert(!lg.contains("regexp_replace") && !lg.contains("regexp_extract"),
      s"q_link_graph re-grew a regex chain:\n$lg")
  }
}
