package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.{ExtractChannels, RecFixture, RecScan}
import graft.model.Tables
import graft.ts.{Dedup, GapFill, Sessionize, Validation}
import graft.spikes.Spikes
import graft.ops.{Bm25, Bpe, Curation, Decontaminate, DedupDocs, Dsir, Graph, IncrementalDedup, Ivf, Lm, Mixture, Pca, Pq, QualityClassifier, Redact, SemDedup, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared with the DuckDB oracle:
  *  - event timestamps are epoch MICROSECOND longs (`ts div 1000` on
  *    Spark's nanos-as-long ↔ `epoch_us(ts)` in DuckDB — DuckDB truncates
  *    parquet nanos to its native micros, so both sides agree exactly);
  *  - money/value sums go through DECIMAL so they are associative and
  *    bit-identical regardless of execution order, then cast back to
  *    double;
  *  - derived doubles that feed comparisons/rankings are rounded (4-6dp)
  *    on BOTH sides before use.
  */
object SparkEntry {

  /** 10 minutes in micros — global session gap for the events stream. */
  private val GlobalGapUs = 600000000L

  /** 6 hours in micros — per-user session gap. */
  private val UserGapUs = 21600000000L

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.3 "session epochs report". */
  def entry(spark: SparkSession): DataFrame =
    qSessionEpochs(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** W1 global sessionize (scalable two-pass, no single-task sort). */
  private def qSessionEpochs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("ts_us")
    val seg = Sessionize.withSegmentIdGlobal(ev, "ts_us", GlobalGapUs)
    Sessionize
      .segments(seg, "ts_us", 1L)
      .select(
        col("segment_id"),
        col("start").as("start_us"),
        col("stop").as("stop_us"),
        col("n").as("n_events")
      )
  }

  /** W1 keyed sessionize per user. */
  private def qUserSessions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "ts_us")
    Sessionize
      .withSegmentIdKeyed(ev, "ts_us", UserGapUs, Seq("user_id"))
      .groupBy("user_id", "segment_id")
      .agg(
        min("ts_us").as("start_us"),
        (max(col("ts_us")) + 1L).as("stop_us"),
        count(lit(1)).as("n_events")
      )
  }

  /** A6 gap lengths between global segments. */
  /** A9 median forward-step estimate (jagular/utils.py:189-190) over the
    * full event stream — the keyless path, so the diffs come from the
    * [[graft.ts.OrderedStream]] neighbor exchange (two-pass range
    * partition), not a single-task global window. Exact median, rounded
    * to 1dp on both sides (integer-multiset median is k or k+0.5 —
    * exact in a double either way). */
  private def qMedianStep(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .medianStep(Tables.events(s, dir).select("ts_us"), "ts_us")
      .select(round(col("step"), 1).as("step"))

  private def qGapStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("ts_us")
    val seg = Sessionize.withSegmentIdGlobal(ev, "ts_us", GlobalGapUs)
    val segs = Sessionize.segments(seg, "ts_us", 1L)
    Sessionize
      .gapLengths(segs)
      .select(
        col("segment_id"),
        col("start").as("start_us"),
        col("stop").as("stop_us"),
        // -1 sentinel (both sides): NULL ints coerce to float64/NaN in
        // pandas-shaped compares and break value hashing.
        coalesce(col("gap_before"), lit(-1L)).as("gap_before_us")
      )
  }

  /** U2 dedup-keep-first on minute buckets (deterministic tiebreak). */
  private def qDedupKeepFirst(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .withColumn("ts_min", expr("ts_us div 60000000"))
    Dedup
      .keepFirst(ev, Seq("ts_min"), Seq("ts_us", "event_id"))
      .select("ts_min", "event_id", "user_id")
  }

  /** J4/F1 small-gap linear interpolation on an integral-ts signal. */
  private def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables
      .events(s, dir)
      .where(col("event_id") % 7 =!= 0)
      .select(col("event_id").as("sts"), col("value"))
    GapFill
      .linear(sig, "sts", "value", step = 1L, maxGapSize = 5L)
      .select(col("sts"), round(col("value"), 4).as("value"), col("interpolated"))
  }

  /** Event-time TUMBLING-WINDOW aggregation in batch — the hash-checked
    * twin of the streaming windowed-agg semantics (tokenRateStream /
    * sessionCounts run the same epoch-aligned windows with a watermark).
    * Integral-micros timestamps make the window a plain integer
    * division; one map-side-combinable aggregate (the exact
    * distinct-user count is the one expand). */
  private def qEventWindows(s: SparkSession, dir: String): DataFrame = {
    val winUs = 900000000L // 15 min
    Tables.events(s, dir)
      .groupBy(expr(s"ts_us div $winUs").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        (col("win") * winUs).as("win_start_us"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))
  }

  /** Per-event-type z-score anomaly flags ([[graft.ops.Anomaly]]): the
    * ingestion-telemetry guardrail, k=2 so the synthetic uniform-ish
    * values still flag tails. DECIMAL-exact sums ⇒ engine and oracle
    * walk identical doubles. */
  private def qZscore(s: SparkSession, dir: String): DataFrame =
    graft.ops.Anomaly
      .zscoreFlags(
        Tables.events(s, dir).select("event_id", "event_type", "value"),
        valueCol = "value", groupCols = Seq("event_type"), k = 2.0)
      .select("event_id", "event_type", "value", "z", "group_mean")

  /** Two-sided CUSUM drift flags ([[graft.ops.Anomaly.cusumFlags]]):
    * per-user cumulative excursions of the event value past
    * target 50 ± slack 5, fired at h = 300 — the loop-carried SPC
    * recurrence as two chained window passes (prefix sum − running
    * min), DECIMAL-exact so the oracle walks the identical arithmetic. */
  private def qCusum(s: SparkSession, dir: String): DataFrame =
    graft.ops.Anomaly.cusumFlags(
      Tables.events(s, dir).select("event_id", "user_id", "ts_us", "value"),
      valueCol = "value",
      keyCols = Seq("user_id"),
      orderCols = Seq("ts_us", "event_id"),
      target = new java.math.BigDecimal("50.00"),
      slack = new java.math.BigDecimal("5.00"),
      h = new java.math.BigDecimal("300.00"))

  /** Ordered funnel conversion ([[graft.ops.Funnel.conversion]]):
    * view → click → purchase anchored at each user's first view, later
    * steps strictly ordered and within 48 h of the anchor — the chained
    * earliest-step windows ride ONE user exchange; the oracle walks the
    * identical window chain. */
  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.conversion(
      Tables.events(s, dir).select("user_id", "ts_us", "event_type"),
      tsCol = "ts_us",
      userCol = "user_id",
      typeCol = "event_type",
      steps = Seq("view", "click", "purchase"),
      maxSpanUs = 172800000000L)

  /** Signup→purchase conversion timing
    * ([[graft.ops.Funnel.stepTiming]]): per user the delta from first
    * signup to first at-or-after purchase, exact type-1 P50/P90/P99
    * of the deltas via the integer-pick rule. */
  private def qStepTiming(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.stepTiming(
      Tables.events(s, dir).select("user_id", "ts_us", "event_type"),
      "user_id", "ts_us", "event_type", "signup", "purchase")

  /** Daily growth accounting ([[graft.ops.Funnel.growthAccounting]]):
    * per day, active users split into new / retained / resurrected,
    * churn counted out of the previous day (n_active(t−1) −
    * n_retained(t)), 6dp churn rate — the canonical
    * new/retained/resurrected/churned product readout. */
  private def qGrowth(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.growthAccounting(
      Tables.events(s, dir).select("user_id", "ts_us"),
      "ts_us", "user_id", periodUs = 86400000000L)

  /** Densified growth accounting
    * ([[graft.ops.Funnel.growthAccountingDense]]) over a SPARSE
    * calendar: every third day's events are dropped (day ≡ 1 mod 3),
    * so the fixture has guaranteed all-churn transitions — the case
    * the sparse readout reports nowhere (its documented caveat). The
    * empty days must appear as zero-activity rows whose `n_churned`
    * carries the previous day's entire active count. */
  private def qGrowthDense(s: SparkSession, dir: String): DataFrame = {
    val day = ((col("ts_us") - col("ts_us") % 86400000000L) / 86400000000L).cast("long")
    graft.ops.Funnel.growthAccountingDense(
      Tables.events(s, dir).select(col("user_id"), col("ts_us")).where(day % 3 =!= 1L),
      "ts_us", "user_id", periodUs = 86400000000L)
  }

  /** DAU/WAU engagement ([[graft.ops.Funnel.activeUsers]], 7-day
    * window): per active day the distinct-user count, the rolling
    * 7-day distinct count (explode-to-window-end re-distinct — rolling
    * DISTINCT doesn't decompose as a window sum), and the 6dp
    * stickiness ratio. */
  private def qDau(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.activeUsers(
      Tables.events(s, dir).select("user_id", "ts_us"),
      "ts_us", "user_id", periodUs = 86400000000L, windowDays = 7)

  /** Class-balanced sampling weights
    * ([[graft.ops.Labels.classWeights]]) over the 10-class embeddings
    * labels — sklearn's `balanced` N/(K·n_c) per class, exact 6dp. */
  private def qClassWeights(s: SparkSession, dir: String): DataFrame =
    graft.ops.Labels.classWeights(
      Tables.embeddings(s, dir).select(
        concat(lit("l"), col("label").cast("string")).as("label")),
      "label")

  /** Weekly cohort retention ([[graft.ops.Funnel.retention]]): users
    * grouped by the 7-day period of their first event, distinct-active
    * counts per later period, rate against the offset-0 cohort size. */
  private def qCohortRetention(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.retention(
      Tables.events(s, dir).select("user_id", "ts_us"),
      tsCol = "ts_us",
      userCol = "user_id",
      periodUs = 604800000000L)

  /** Windowed power spectra ([[graft.dsp.Spectral]]): per-user 8-sample
    * windows over the event value stream through the radix-2 FFT
    * kernel; the oracle recomputes every bin with an UNROLLED direct
    * DFT (generated literal trig sums) — an independent formulation, so
    * the FFT butterflies are cross-checked end to end, not
    * self-compared. */
  private def qPsd(s: SparkSession, dir: String): DataFrame =
    graft.dsp.Spectral.windowPowerSpectra(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"),
      orderCols = Seq(col("ts_us").asc, col("event_id").asc),
      valueCol = "value",
      windowSize = 8)

  /** Band-power rollup over the q_psd windows ([[graft.dsp.Spectral
    * .windowBandPower]]): low = bins 0-1, mid = 2, high = 3-4 — raw bin
    * powers summed ascending-k then log-compressed, oracle spelled
    * identically from the unrolled DFT bins. */
  private def qBandPower(s: SparkSession, dir: String): DataFrame =
    graft.dsp.Spectral.windowBandPower(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"),
      orderCols = Seq(col("ts_us").asc, col("event_id").asc),
      valueCol = "value",
      windowSize = 8,
      bands = Seq(("low", 0, 1), ("mid", 2, 2), ("high", 3, 4)))

  /** STFT: q_psd's windows hopped by 4 (50 % overlap — the Welch
    * standard) through [[graft.dsp.Spectral.windowPowerSpectraHopped]];
    * the oracle re-derives window membership with an explicit
    * generate_series join. */
  private def qStft(s: SparkSession, dir: String): DataFrame =
    graft.dsp.Spectral.windowPowerSpectraHopped(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"),
      orderCols = Seq(col("ts_us").asc, col("event_id").asc),
      valueCol = "value",
      windowSize = 8,
      hop = 4)

  /** Welch magnitude-squared coherence ([[graft.dsp.Spectral
    * .coherence]], windowSize 8) between the parity-split channels of
    * each user's value stream: per-window complex FFT bins quantized
    * to 4dp DECIMAL so the Welch sums are exact; the oracle recomputes
    * every bin with unrolled direct-DFT trig sums. */
  private def qCoherence(s: SparkSession, dir: String): DataFrame =
    graft.dsp.Spectral.coherence(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"),
      orderCols = Seq(col("ts_us").asc, col("event_id").asc),
      valueCol = "value",
      windowSize = 8)

  /** Mutual-kNN graph ([[graft.ops.Similarity.mutualKnn]], k = 5)
    * over the decimated node subset (vec_id % 10 — the bounded-frame
    * contract of the exact form; IVF/LSH candidates are the 100 TB
    * route): symmetric edges where each endpoint ranks in the other's
    * cosine top-5. */
  private def qKnnGraph(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.mutualKnn(
      Tables.embeddings(s, dir)
        .where(col("vec_id") % 10 === 0)
        .select("vec_id", "embedding"),
      k = 5)

  /** F13/F14 timestamp validation report. */
  private def qTsValidation(s: SparkSession, dir: String): DataFrame =
    Validation.report(Tables.events(s, dir), "ts_us", "event_id")

  /** A3+P5+W2: MAD threshold then ≥2-consecutive crossings. */
  private def qMadCrossings(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
    val thr = Spikes.madThreshold(ev, "value", 2.0).first().getDouble(0)
    Spikes.crossings(ev, "event_id", "value", thr, "pos")
  }

  /** W4/J3 patch gather around crossing peaks (range join, exploded form). */
  private def qPatchExtract(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
    val thr = Spikes.madThreshold(ev, "value", 2.0).first().getDouble(0)
    val peaks = Spikes.crossings(ev, "event_id", "value", thr, "pos")
    Spikes.extractPatches(ev, peaks, "event_id", "value", halfWidth = 3)
  }

  /** Spike-triggered average ([[graft.spikes.Spikes.triggeredAverage]])
    * over the q_patch_extract gather: per offset from the trigger, the
    * peri-event count and 6dp mean — the PSTH readout of the spike
    * chain. */
  private def qSta(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
    val thr = Spikes.madThreshold(ev, "value", 2.0).first().getDouble(0)
    val peaks = Spikes.crossings(ev, "event_id", "value", thr, "pos")
    Spikes.triggeredAverage(
      Spikes.extractPatches(ev, peaks, "event_id", "value", halfWidth = 3))
  }

  /** A8 running sum per user (decimal-exact cumulative). */
  private def qRunningSum(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val w = Window
      .partitionBy("user_id")
      .orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(
      col("event_id"),
      col("user_id"),
      col("ts_us"),
      sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("cum_value")
    )
  }

  /** TPC-H Q1-shaped pricing summary (decimal-exact sums). */
  private def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val qty = col("l_quantity").cast("decimal(12,2)")
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(3,2)")
    val tax = col("l_tax").cast("decimal(3,2)")
    l.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(3,2)") - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1).cast("decimal(3,2)") - disc) * (lit(1).cast("decimal(3,2)") + tax))
          .cast("double")
          .as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 6))
  }

  /** TPC-H Q3-shaped revenue top-10 (broadcast dim joins, deterministic
    * tiebreak on the limit). */
  private def q3Revenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(3,2)")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(price * (lit(1).cast("decimal(3,2)") - disc)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier revenue: two broadcast dim chains
    * meeting at the fact table, grouped by nation. */
  private def q5Nation(s: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(3,2)")
    Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey")
      )
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(price * (lit(1).cast("decimal(3,2)") - disc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q6-shaped forecast: pure pushed-down filter + scalar agg. */
  private def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .where(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.09) &&
          col("l_quantity") < 24
      )
      .agg(
        sum(
          col("l_extendedprice").cast("decimal(12,2)") * col("l_discount").cast("decimal(3,2)")
        ).cast("double").as("revenue"),
        count(lit(1)).as("n_items")
      )

  /** Text token/quality statistics. */
  private def qDocStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    Text.tokenStats(d).join(Text.qualityScores(d), "doc_id")
  }

  /** Exact content-hash dedup groups. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    DedupDocs.exactGroups(Tables.documents(s, dir))

  /** Exact blocked n-gram Jaccard near-dup pairs. */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    DedupDocs.ngramJaccardPairs(
      Tables.documents(s, dir),
      k = 3,
      threshold = 0.8,
      blockCol = "source"
    )

  /** Brute-force cosine top-k (k=10) for query vectors vec_id < 5. */
  private def qSimTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 10)
  }

  /** PCA dimension reduction over the embedding table ([[Pca]]): one
    * mergeable O(d²) moments aggregate → driver Jacobi eigensolve →
    * zero-shuffle projection onto the top-4 components. The trained
    * model is recorded for the generated term-sum oracle. */
  private def qPcaProject(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val model = Pca.fit(e, dim = 64, k = 4)
    pcaOracleArtifacts = Some(model)
    Pca.project(e, model)
  }

  /** SQ8 int8-quantized cosine top-k ([[graft.ops.Sq]]): per-vector
    * max-abs scaling to tinyint, integer-exact scoring (the scales
    * cancel in cosine), 4× smaller serving rows. Same query set /
    * k / tie contract as q_sim_topk so the two are comparable. */
  private def qSq8Topk(s: SparkSession, dir: String): DataFrame = {
    val qz = graft.ops.Sq.quantize(Tables.embeddings(s, dir))
    graft.ops.Sq.topK(qz, qz.where(col("vec_id") < 5), k = 10)
  }

  /** IVF-probed SQ8 serving ([[graft.ops.Sq.topKIvf]]): the quantized
    * column dropped into the IVF index shape — cell-assigned int8 rows,
    * driver cell ranking, broadcast probe, bucket equi-join. Full
    * probing (nProbe == nLists) makes it equal [[qSq8Topk]] exactly, so
    * it shares that oracle; the machinery is what runs at nProbe <
    * nLists. */
  private def qIvfSq8(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val (assigned, cents) = Ivf.assignCells(e, nLists = 8)
    val assignedQ = graft.ops.Sq.quantize(assigned).select("vec_id", "cell", "qvec", "qsq")
    val queries = graft.ops.Sq.quantize(e.where(col("vec_id") < 5), dropInput = false)
    graft.ops.Sq.topKIvf(assignedQ, cents, queries, k = 10, nProbe = 8)
  }

  /** MinHash-LSH candidate pairs (oracle-checked: the banding IS
    * SQL-expressible — see the q_minhash_lsh entry). */
  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    DedupDocs.minhashLshPairs(Tables.documents(s, dir), k = 3, numHashes = 16, rowsPerBand = 4)

  /** Per-source vocabulary size ([[Text.vocabSize]], exact form —
    * the HLL twin is spec-measured in VocabSketchSpec). */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    Text.vocabSize(Tables.documents(s, dir), Seq("source"))

  /** Per-source exact-duplication report ([[DedupDocs.dupRateBySource]]). */
  private def qDupRate(s: SparkSession, dir: String): DataFrame =
    DedupDocs.dupRateBySource(Tables.documents(s, dir))

  /** Broder containment near-dup pairs
    * ([[DedupDocs.ngramContainmentPairs]]): catches the short-doc-
    * quoted-inside-long-doc duplication class whose Jaccard stays tiny. */
  private def qContainment(s: SparkSession, dir: String): DataFrame =
    DedupDocs.ngramContainmentPairs(
      Tables.documents(s, dir), k = 3, threshold = 0.6, blockCol = "source")

  /** Cross-source duplicate-leakage matrix
    * ([[DedupDocs.sourceOverlapMatrix]]): the q_minhash_lsh pair set
    * rolled up to normalized (source, source) counts — the
    * which-sources-copy-from-each-other report a mixture designer reads
    * before choosing weights. */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    DedupDocs.sourceOverlapMatrix(
      Tables.documents(s, dir), k = 3, numHashes = 16, rowsPerBand = 4)

  /** Incremental LSH dedup: the `doc_id % 4 == 0` quarter plays the
    * ingest batch, the rest the persisted corpus (whose band index is
    * what a real deployment would READ, not rebuild — built here because
    * the oracle owns no side state). The batch side is broadcast; the
    * index side never shuffles. */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idx = IncrementalDedup.buildIndex(
      docs.where(col("doc_id") % 4 =!= 0), k = 3, numHashes = 16, rowsPerBand = 4)
    IncrementalDedup.screen(
      docs.where(col("doc_id") % 4 === 0), idx, k = 3, numHashes = 16, rowsPerBand = 4)
  }

  /** Signature-verified incremental screening: same corpus/batch split
    * as q_dedup_incremental, but the index carries minhash signatures
    * and a band collision only flags when the pair's estimated Jaccard
    * (matching components / 16) reaches 0.5 — the precision knob over
    * collision-as-decision. */
  private def qDedupIncrementalVerified(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idx = IncrementalDedup.buildIndexWithSignatures(
      docs.where(col("doc_id") % 4 =!= 0), k = 3, numHashes = 16, rowsPerBand = 4)
    IncrementalDedup.screenVerified(
      docs.where(col("doc_id") % 4 === 0), idx,
      k = 3, numHashes = 16, rowsPerBand = 4, minJaccard = 0.5)
  }

  /** Context-window chunking of the documents table (size 32, overlap 4
    * — every token covered, consecutive chunks share 4 tokens). */
  private def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    Text.chunkDocs(Tables.documents(s, dir), size = 32, overlap = 4)

  /** Per-source corpus report (exact-percentile oracle form; the
    * t-digest approx form is the 100 TB path, spec-compared). */
  private def qCorpusStats(s: SparkSession, dir: String): DataFrame =
    Text.corpusStats(Tables.documents(s, dir))

  /** Per-language percentile quality gate ([[Text.percentileGate]]):
    * keep each language's top half by type-token ratio. The rank comes
    * from a (lang, score) histogram, never a per-language corpus sort —
    * the oracle spells the textbook percent_rank window, the engine the
    * scalable twin. */
  private def qQualityGate(s: SparkSession, dir: String): DataFrame = {
    val scored = Text
      .qualityScores(Tables.documents(s, dir), keep = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("type_token_ratio").as("score"))
    Text
      .percentileGate(scored, "score", Seq("lang"), minPercentile = 0.5)
      .select("doc_id", "lang", "score", "pct")
  }

  /** Canonical normalization ([[Text.normalizeDocs]]): collapse → lower
    * → NFC. The corpus is ASCII (fast path), so a decomposed-Unicode
    * suffix (e + combining acute U+0301, double space, upper case) is
    * appended on BOTH sides to make the oracle exercise real
    * composition, not just the identity path. */
  private def qNormalize(s: SparkSession, dir: String): DataFrame =
    Text.normalizeDocs(
      Tables.documents(s, dir)
        .withColumn("text", concat(col("text"), lit(" Cafe\u0301  STRASSE"))))

  /** PMI collocation mining ([[Text.pmiBigrams]]): top-20 bigrams with
    * ≥5 occurrences by pointwise mutual information. */
  private def qPmi(s: SparkSession, dir: String): DataFrame =
    Text.pmiBigrams(Tables.documents(s, dir), minCount = 5, k = 20)

  /** Gopher-style rule filter ([[Text.gopherFilter]]) — thresholds cut
    * inside this corpus's measured distributions so every rule
    * exercises both outcomes. */
  private def qGopher(s: SparkSession, dir: String): DataFrame =
    Text.gopherFilter(
      Tables.documents(s, dir),
      minTokens = 20, maxTokens = 80,
      minMwl = 4.0, maxMwl = 10.0,
      minStopRatio = 0.02, minTtr = 0.35)

  /** HTML extraction ([[Text.stripHtml]]): the corpus wrapped in a
    * deterministic page shell (tags, attributes, a style block, a
    * script block, entities) on BOTH sides, so the oracle checks real
    * tag/entity handling, not identity. */
  private def qHtmlStrip(s: SparkSession, dir: String): DataFrame =
    Text.stripHtml(
      Tables.documents(s, dir).withColumn(
        "text",
        concat(
          lit("<html><head><style>p { color: red }</style></head><body><p class=\"x\">"),
          col("text"),
          lit(" &amp; more &lt;tags&gt; &quot;q&#39;</p><script>var x = 1;</script></body></html>"))))

  /** Sidecar-metadata extraction ([[graft.ops.Metadata.fieldStats]]):
    * per-event-type stats of the numeric `k` field parsed out of the
    * `props` JSON string — codegen'd parse, no UDF, no extra scan. */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    graft.ops.Metadata
      .fieldStats(
        Tables.events(s, dir).select("event_type", "props"),
        jsonCol = "props",
        fieldPath = "k",
        groupCols = Seq("event_type"))

  /** Per-source epoch replication ([[Mixture.epochReplicate]]): src0
    * 3 epochs, src1 2, src2 dropped, everything else 1. */
  private def qEpochs(s: SparkSession, dir: String): DataFrame =
    Mixture
      .epochReplicate(
        Tables.documents(s, dir),
        Map("src0" -> 3, "src1" -> 2, "src2" -> 0))
      .select("doc_id", "source", "epoch")

  /** Curriculum / annealing order ([[Mixture.curriculumOrder]]): phase
    * "main" = the whole corpus, phase "anneal" = the q_quality_gate
    * survivors re-sampled after it — phase-major global rank via the
    * two-pass shuffle recipe, each phase an independent deterministic
    * reshuffle. */
  private def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = Text
      .qualityScores(docs, keep = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("type_token_ratio").as("score"))
    val anneal = Text.percentileGate(scored, "score", Seq("lang"), 0.5).select("doc_id")
    Mixture.curriculumOrder(
      Seq("main" -> docs.select("doc_id"), "anneal" -> anneal),
      salt = "cur1")
  }

  /** Deterministic 80/10/10 train/val/test assignment. */
  private def qSplitAssign(s: SparkSession, dir: String): DataFrame =
    Mixture
      .splitAssign(
        Tables.documents(s, dir),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "split1")
      .select("doc_id", "source", "split")

  /** Deterministic global training-order shuffle (two-pass scalable
    * rank — no single-partition window; the oracle spells the same
    * permutation as one global row_number). */
  private def qShuffle(s: SparkSession, dir: String): DataFrame =
    Mixture
      .deterministicShuffle(Tables.documents(s, dir), salt = "shuf1")
      .select("doc_id", "shuffle_rank")

  /** PQ serving shape: ADC shortlist from the m-byte codes table, exact
    * L2 re-rank of the fetched shortlist. The k-means codebooks are
    * driver-side arrays: training records them so [[oracleSql]] can
    * constant-fold them into a DuckDB VALUES table (the q_align /
    * q_filtfilt generated-oracle recipe) — ADC is then m lookups + SUM
    * in plain SQL, and the query is fully hash-checked. PqSpec pins
    * encode/ADC kernel semantics, training determinism, and recall. */
  private def qPqTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val cb = Pq.train(e, m = 4, ksub = 16, iters = 6)
    pqOracleArtifacts = Some(cb)
    Pq.adcTopKReranked(
      Pq.encode(e, cb), e, e.where(col("vec_id") < 5), cb, k = 10, rerank = 4)
  }

  /** IVF-PQ serving shape: coarse cells + residual codes, probed-cell
    * ADC shortlist, exact re-rank. Oracle-checked like q_pq_topk: the
    * trained centroids + residual codebooks become VALUES tables in the
    * generated SQL. PqSpec pins residual semantics and the recall
    * advantage. */
  private def qIvfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val cents = Ivf.trainCentroids(e, nLists = 16, iters = 6)
    val cb = Pq.trainResidual(e, cents, m = 4, ksub = 16, iters = 6)
    ivfPqOracleArtifacts = Some((cents, cb))
    Pq.ivfPqTopK(
      Pq.encodeIvfPq(e, cents, cb).select(col("vec_id"), col("cell"), col("code")),
      e, e.where(col("vec_id") < 5), cents, cb, k = 10, nProbe = 4, rerank = 4)
  }

  /** Full spike chain incl. refractory censor (oracle-checked: the
    * loop-carried censor walk runs as a recursive CTE). */
  private def qSpikeCensor(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
    val thr = Spikes.madThreshold(ev, "value", 2.0).first().getDouble(0)
    val peaks = Spikes.crossings(ev, "event_id", "value", thr, "pos")
    Spikes.censor(peaks, "event_id", width = 5L, keys = Nil)
  }

  /** W3 KEYED refractory censor — the shape that scales: one independent
    * loop-carried fold per user (repartition by key, fold within
    * partitions; embarrassingly parallel across keys), vs the keyless
    * q_spike_censor whose truly-global walk is inherently one task. At
    * 100 TB the key is the channel/tetrode — the reference's own unit of
    * work. Oracle: the same recursive-CTE censor walk, per key. */
  private def qSpikeCensorKeyed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "value")
    val thr = Spikes.madThreshold(ev, "value", 2.0).first().getDouble(0)
    val hits = ev.where(col("value") > thr)
    Spikes.censor(hits, "event_id", width = 500L, keys = Seq("user_id"))
  }

  /** G4 dumbsample: every 10th event per user + the last. */
  private def qDecimate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id")
    graft.dsp.Decimate
      .dumbsample(ev, q = 10, tsCol = "event_id", keys = Seq("user_id"))
  }

  /** G6/P4 tetrode assembly on a synthetic 4-channel signal derived from
    * events (sample = event_id div 4, channel = event_id mod 4). */
  private def qTetrode(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val chans = ev.select(
      expr("event_id div 4").as("idx"),
      (col("event_id") % 4).as("channel"),
      col("value")
    )
    val ch0 = chans.where(col("channel") === 0).select(col("idx"), col("value"))
    val thr = Spikes.madThreshold(ch0, "value", 2.0).first().getDouble(0)
    val peaks = Spikes.crossings(ch0, "idx", "value", thr, "pos")
    graft.spikes.Tetrode.formTetrodeExploded(
      chans, peaks, "idx", "channel", "value",
      halfWidth = 2, maxAmplitude = 240.0, sampRate = 1000.0
    )
  }

  /** Language-ID heuristic (marker-token scoring, deterministic). */
  private val langMarkers = Map(
    "de" -> Seq("der", "die"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la"),
    "fr" -> Seq("le", "un")
  )
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    Text.langId(Tables.documents(s, dir), langMarkers)

  /** Language-ID with confidence margin ([[Text.langIdWithMargin]]):
    * the routing signal for a cascade (margin 0 = ambiguous). */
  private def qLangMargin(s: SparkSession, dir: String): DataFrame =
    Text.langIdWithMargin(Tables.documents(s, dir), langMarkers)

  /** Rolling-hash + md5 fingerprints. */
  private def qFingerprints(s: SparkSession, dir: String): DataFrame =
    Text.fingerprints(Tables.documents(s, dir))

  /** 64-bit SimHash over tokens. */
  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    DedupDocs.simhash(Tables.documents(s, dir))

  /** Mixture weights for q_mixture: benchmark src0 and src6+ excluded,
    * graded weights over five sources. */
  private[graft] val mixtureWeights =
    Map("src1" -> 1.0, "src2" -> 0.75, "src3" -> 0.5, "src4" -> 0.25, "src5" -> 0.1)

  /** Deterministic hash-keyed weighted mixture sample (retry-stable —
    * no rand()). */
  private def qMixture(s: SparkSession, dir: String): DataFrame =
    Mixture
      .sample(Tables.documents(s, dir), mixtureWeights, salt = "mix1")
      .select("doc_id", "source")

  /** Temperature-reweighted sampling (mixture proportions ∝ n_s^α):
    * rates derived FROM the corpus token totals, smallest source kept
    * whole, larger sources hash-downsampled. α = 0.5. */
  private def qTemperatureSample(s: SparkSession, dir: String): DataFrame =
    Mixture.temperatureSample(Tables.documents(s, dir), alpha = 0.5, salt = "temp1")

  /** Exact-25-per-source deterministic sample (eval carving): rank by
    * the uniform hash draw, keep the 25 smallest per source. */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    Mixture.stratifiedSample(Tables.documents(s, dir), k = 25, salt = "strat1")

  /** Token-balanced serpentine shard assignment: 8 output shards,
    * global size-rank via the two-pass range-partition machinery. */
  private def qShardAssign(s: SparkSession, dir: String): DataFrame =
    Mixture.shardAssign(Tables.documents(s, dir), nShards = 8)

  /** Greedy concat-and-chunk sequence packing: 512-token budget per
    * source group. */
  private def qPack(s: SparkSession, dir: String): DataFrame =
    Mixture
      .packSequences(Tables.documents(s, dir), budget = 512, groupCols = Seq("source"))
      .select("doc_id", "source", "n_tokens", "start_off", "seq_id", "seq_off")

  /** Gopher-style n-gram repetition quality signals (one-pass native
    * kernel; the oracle spells the explode/groupBy formulation). */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    Text.repetition(Tables.documents(s, dir))

  /** Corpus-level vocabulary mining: top-10 word 3-grams per source
    * (deterministic count-desc/gram-asc order). */
  private def qTopNgrams(s: SparkSession, dir: String): DataFrame =
    Text.topNgrams(Tables.documents(s, dir), n = 3, k = 10)

  /** The bounded-memory sketch form of q_top_ngrams (mergeable
    * Misra-Gries, [[graft.functions.SpaceSavingTopK]]): capacity is
    * sized above the per-source gram universe, so err = 0, counts are
    * exact, and the EXACT oracle SQL pins the sketch end to end (the
    * compaction regime is TopKSketchSpec's job). err is ASSERTED in the
    * plan (`assert_true` — the job fails loudly on compaction) rather
    * than filtered: a silent `where(err = 0)` would drop a whole
    * group's rows if corpus growth ever pushed it past capacity and
    * surface only as a confusing oracle diff. The oracle's column
    * contract stays the exact operator's. */
  private def qTopNgramsSketch(s: SparkSession, dir: String): DataFrame =
    Text.topNgramsSketch(Tables.documents(s, dir), n = 3, k = 10, capacity = 1 << 18)
      .withColumn("__err_guard", assert_true(col("err") === 0L,
        lit("q_top_ngrams_sketch: sketch compacted (err > 0) — raise capacity")))
      .where(col("__err_guard").isNull) // always true; keeps the assert un-pruned
      .select("source", "ngram", "n_occurrences", "rank")

  /** The full curation chain end-to-end (quality → repetition →
    * decontamination → dedup → mixture → packing), gates calibrated on
    * the sf0.01 distributions so every stage bites. */
  private def qCurate(s: SparkSession, dir: String): DataFrame =
    Curation
      .curate(
        Tables.documents(s, dir),
        isBench = col("source") === "src0",
        Curation.Config(
          minStopwordRatio = 0.02,
          maxMeanWordLen = 5.0,
          maxDup2gramFrac = 0.15,
          weights = mixtureWeights,
          salt = "curate1"
        )
      )
      .select("doc_id", "source", "n_tokens", "start_off", "seq_id", "seq_off")

  /** Benchmark decontamination: corpus docs sharing distinct word
    * 3-grams with the `src0` benchmark slice (broadcast shingle-set
    * semi-join, O(matches) aggregate; flagged at >= 5 shared shingles —
    * calibrated on the sf0.01 corpus where the overlap median is 3). */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    Decontaminate.overlapFlags(
      Tables.documents(s, dir),
      isBench = col("source") === "src0",
      k = 3,
      minOverlap = 5
    )

  /** Fuzzy decontamination: corpus docs NEAR-duplicating the `src0`
    * benchmark slice via MinHash-LSH band collision (16 hashes, 4
    * bands — the q_minhash_lsh parameters) — the paraphrase-robust
    * companion to [[qDecontaminate]]'s exact-shingle overlap. */
  private def qDecontamFuzzy(s: SparkSession, dir: String): DataFrame =
    Decontaminate.fuzzyOverlap(
      Tables.documents(s, dir),
      isBench = col("source") === "src0",
      k = 3)

  /** [[qDecontamFuzzy]] with signature verification at estimated
    * Jaccard ≥ 0.5 (the screenVerified precision knob — a lone 4-hash
    * band collision no longer drops a training doc). */
  private def qDecontamFuzzyVerified(s: SparkSession, dir: String): DataFrame =
    Decontaminate.fuzzyOverlapVerified(
      Tables.documents(s, dir),
      isBench = col("source") === "src0",
      k = 3)

  /** Corpus-LM quality scoring: per-doc avg token log-prob + perplexity
    * under the corpus's own add-1-smoothed unigram LM (CCNet-style
    * filtering signal; vocab aggregated once, collected small →
    * broadcast scoring join). */
  private def qLmScore(s: SparkSession, dir: String): DataFrame =
    Lm.lmScore(Tables.documents(s, dir))

  /** Bigram Stupid Backoff scoring — the rung above q_lm_score on the
    * CCNet quality-filter ladder (hit path c2/c1, backoff path
    * 0.4·add-1 unigram). minCount=2 prunes hapax bigrams so the
    * backoff branch is actually EXERCISED when scoring the training
    * corpus itself (at minCount=1 every scored bigram is in the model
    * and the backoff term would be dead code in both engines). */
  private def qLmBigram(s: SparkSession, dir: String): DataFrame =
    Lm.bigramScore(Tables.documents(s, dir), minCount = 2)

  /** Trigram Stupid Backoff scoring ([[graft.ops.Lm.trigramScore]],
    * minCount 2): the three-tier backoff ladder (trigram → bigram →
    * add-1 unigram), every distinct trigram scored once on the model
    * table. */
  private def qLmTrigram(s: SparkSession, dir: String): DataFrame =
    Lm.trigramScore(Tables.documents(s, dir), minCount = 2)

  /** Duplicated-span coverage: token 10-grams occurring >1 time in the
    * corpus mark their positions duplicated; per-doc covered-token
    * fraction (Lee et al.-style exact-substring dedup signal). */
  private def qDupSpans(s: SparkSession, dir: String): DataFrame =
    DedupDocs.dupSpans(Tables.documents(s, dir), k = 10)

  /** Exact-substring span removal (the [[qDupSpans]] remediation): strip
    * every token covered by a corpus-duplicated 10-gram, rebuild the
    * text in token order. */
  private def qStripSpans(s: SparkSession, dir: String): DataFrame =
    DedupDocs.stripDupSpans(Tables.documents(s, dir), k = 10)

  /** LINE-level dedup (RefinedWeb/Falcon boilerplate removal): a line
    * occurring in ≥2 distinct documents is stripped from all of them.
    * The corpus has no newlines, so the query first linifies each
    * document deterministically (a line break every 20 tokens — shared
    * near-dup prefixes then collide as real duplicate lines; 53 dup
    * lines / 112 occurrences at sf0.01), with the identical
    * linification spelled in the oracle. */
  private def qLineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = split(col("text"), " ")
    val nLines = ceil(size(toks) / lit(20.0)).cast("int")
    val linified = docs.select(
      col("doc_id"),
      concat_ws(
        "\n",
        transform(
          sequence(lit(0), nLines - 1),
          i => concat_ws(" ", slice(toks, i * 20 + 1, lit(20))))
      ).as("text"))
    DedupDocs.stripDupLines(linified, minDocs = 2)
  }

  /** Dictionary scrubbing via the [[Redact]] PII machinery: blocklisted
    * terms replaced by a placeholder, per-doc match counts. (The PII
    * patterns themselves are spec-exercised — the synthetic corpus has
    * no digits or '@'.) */
  private def qRedact(s: SparkSession, dir: String): DataFrame =
    Redact.redactReport(
      Tables.documents(s, dir),
      Seq(("blocked", Redact.blocklistPattern(Seq("spark", "table")), "[TERM]"))
    )

  /** BM25 lexical top-k retrieval: the lexical counterpart of the ANN
    * stack (decontamination review / topical mining / hybrid retrieval's
    * sparse side). Token arrays are filtered to the query terms BEFORE
    * exploding, df folds into per-term idf constants, and top-k is
    * TakeOrderedAndProject — no join, no full sort. "zzz" exercises the
    * absent-term path. */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    Bm25.topK(
      Tables.documents(s, dir),
      Seq("scan", "join", "vector", "stream", "merge", "zzz"),
      k = 25
    )

  // same lifecycle as ivfIndexCache (shutdown-hook cleanup via
  // ivfTempDirs, same same-session staleness note)
  private val bm25IndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def bm25Index(s: SparkSession, dir: String): String =
    bm25IndexCache.getOrElseUpdate(dir, {
      val baseDir = java.nio.file.Files.createTempDirectory("graft-bm25-")
      ivfTempDirs.add(baseDir)
      Bm25.buildIndex(Tables.documents(s, dir), baseDir.toString, nBuckets = 64)
      baseDir.toString
    })

  /** BM25 SERVING over a pre-built bucket-partitioned postings index
    * ([[graft.ops.Bm25.buildIndex]]): times only the probe — a static
    * bucket-pruned df lookup + postings scan, no corpus tokenize. Same
    * terms/k as q_bm25, so results (and the oracle) are identical. */
  private def qBm25Serve(s: SparkSession, dir: String): DataFrame =
    Bm25.topKIndexed(
      s, bm25Index(s, dir),
      Seq("scan", "join", "vector", "stream", "merge", "zzz"),
      k = 25
    )

  /** Hybrid retrieval: RRF fusion ([[graft.ops.Hybrid]]) of the q_bm25
    * lexical top-25 with the dense top-25 for query vector 0 — fusion
    * runs over the two candidate LISTS (≤25 rows each), so the join and
    * final top-k are O(N) regardless of corpus size; the corpus work
    * stays inside the retrievers. The dense retriever is the IVF path
    * ([[graft.ops.Ivf.topK]], hash join on cell — no nested-loop plan);
    * at nProbe == nLists it returns exactly the brute-force top-25, so
    * the oracle's brute-force SQL is unchanged. */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = graft.ops.Hybrid
      .withRank(
        Bm25.topK(Tables.documents(s, dir), Seq("scan", "join", "vector", "stream", "merge", "zzz"), k = 25),
        Seq(col("score").desc, col("doc_id").asc))
      .select("doc_id", "rank")
    val e = Tables.embeddings(s, dir)
    val dense = Ivf
      .topK(e, e.where(col("vec_id") === 0), k = 25, nLists = 8, nProbe = 8)
      .select(col("vec_id").as("doc_id"), col("rank"))
    graft.ops.Hybrid.rrfFuse(lex, dense, k = 15)
  }

  /** Dedup clusters: MinHash-LSH candidate pairs → connected components
    * → (doc_id, cluster_id = min doc of the component). The step that
    * turns pair sets into deduplication decisions. Uses STAR pairs
    * (bucket head vs rest): O(members) per bucket instead of O(members²)
    * with the identical transitive closure — which is also what the
    * oracle's recursive CTE computes over the full pair set. */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = DedupDocs.minhashLshPairs(docs, k = 3, numHashes = 16, rowsPerBand = 4, star = true)
    DedupDocs.connectedComponents(docs.select("doc_id"), pairs)
  }

  /** Weighted PageRank over the customer↔supplier co-purchase graph
    * (orders⋈lineitem, both directions, weight = shared line items) —
    * the authority-prior operator a link-graph curation pipeline runs
    * over page/domain graphs ([[graft.ops.Graph.pagerank]]). 5 power
    * iterations, d = 0.85; the oracle unrolls the identical recurrence
    * as 5 chained CTEs. Ranks sum to 1; rounded to 6 dp on both sides. */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val arcs = o
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .agg(count(lit(1)).cast("double").as("w"))
    // long node ids — customers even (2k), suppliers odd (2k+1): long
    // keys keep the whole pipeline (agg, collect, driver index) off
    // string hashing (measured 4.1 → 3.4 s at sf0.1 vs 'c'||id strings).
    // The both-directions explode moved INTO the operator (r18
    // `symmetrize`): the op caches/collects the 587 k-pair half list and
    // mirrors it driver-side in the identical interleaved order, so the
    // ranks are bit-identical to the explode spelling while the cache
    // write and the driver-gate collect halve.
    val edges = arcs.select(
      (col("cust") * 2L).as("src"),
      (col("supp") * 2L + 1L).as("dst"),
      col("w"))
    Graph
      .pagerank(edges, iterations = 5, damping = 0.85, weightCol = Some("w"),
        // one row per (cust, supp) pair; src even / dst odd, so no pair
        // can appear in both orientations and no self-loops exist
        assumeCollapsed = true, symmetrize = true)
      .select(col("node"), round(col("rank"), 6).as("pr"))
  }

  /** Canonical selection over the near-dup clusters: the q_dedup_clusters
    * components re-scored so each cluster keeps its HIGHEST
    * type-token-ratio member (ties → smallest doc_id) instead of
    * keep-first — the curation refinement that keeps the clean original
    * over truncated/wrapped copies. */
  private def qDedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = DedupDocs.minhashLshPairs(docs, k = 3, numHashes = 16, rowsPerBand = 4, star = true)
    val clusters = DedupDocs.connectedComponents(docs.select("doc_id"), pairs)
    val scores = Text.qualityScores(docs).select(col("doc_id"), col("type_token_ratio"))
    DedupDocs.canonicalPerCluster(clusters, scores, "type_token_ratio")
  }

  /** Salted skew join: events (hot user keys) × per-user counts. The
    * salt fans a hot key across reducers; the RESULT must be identical
    * to the plain equi-join — which is exactly what the oracle checks. */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "user_id")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    graft.ops.SkewJoin
      .saltedInner(ev, dim, key = "user_id", saltFrom = "event_id", salts = 8)
      .select("event_id", "user_id", "n_events")
  }

  /** SimHash banded near-dup pairs (Hamming <= 3 via 16-bit-band
    * pigeonhole candidates + exact bit_count filter). */
  private def qSimhashNearDup(s: SparkSession, dir: String): DataFrame =
    DedupDocs.simhashNearDupPairs(Tables.documents(s, dir), maxHamming = 3)

  /** Multimodal feature extraction over REAL decoded pixels: the JDK
    * codec fixture (PNG even ids / BMP odd, pure-arithmetic pixels)
    * rides [[graft.ops.Multimodal.extractFeatures]] — true decoded
    * (width, height) plus 8 integer-exact pooled-luma features, each
    * recomputed by the oracle from the fixture arithmetic with no
    * decoder, so a green row certifies the real decode path end to
    * end. The FakeDecoder fallback for undecodable payloads stays
    * spec-covered (MultimodalSpec). */
  private def qMultimodal(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal
      .extractFeatures(graft.ops.Multimodal.imageFixture(s, n = 40), "img_id", dim = 8)
      .select(
        col("img_id"), col("width"), col("height"),
        posexplode(col("features")).as(Seq("fi", "fv")))
      .select(
        col("img_id"), col("width"), col("height"),
        col("fi"), col("fv").cast("double").as("fv"))

  /** Multimodal frame sampling: the "video" payload split into
    * fixed-size frames, every 2nd kept, fingerprinted. Pure column ops
    * over the binary column (no kernel). */
  private def qFrames(s: SparkSession, dir: String): DataFrame = {
    val d = graft.ops.Multimodal.withPayload(Tables.documents(s, dir), "text")
    graft.ops.Multimodal
      .sampleFrames(d, frameBytes = 64, stride = 2)
      .select(
        col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5")
      )
  }

  /** REAL image decode + resize, hard-oracle form: deterministic
    * fixture rasters (pixels are pure arithmetic in (img_id, x, y))
    * round-trip the JDK PNG/BMP codecs, then box-filter resize to 8×6,
    * emitted per pixel. The oracle recomputes the ground-truth pixels
    * and the integer box filter arithmetically — no decoder on the
    * oracle side, so a decode bug CANNOT cancel out. */
  private def qImageResize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.resizeRgb(
      graft.ops.Multimodal.imageFixture(s, n = 40), "img_id", outW = 8, outH = 6)

  /** Real JDK WAV decode → per-frame integer-exact features (Σs², zero
    * crossings) over a deterministic PCM16 fixture whose samples are
    * pure arithmetic in (aud_id, i) — the oracle recomputes them in SQL
    * with no decoder, so a green row certifies the javax.sound encode →
    * decode round trip AND the frame kernel. */
  private def qAudioFrames(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.audioFrames(
      graft.ops.Multimodal.audioFixture(s, n = 40), "aud_id", frameSize = 160)

  private val audioFramesOracleSql: String =
    """WITH ids AS (SELECT unnest(generate_series(0, 39)) AS aud_id),
      |lens AS (SELECT aud_id, 400 + (aud_id % 5) * 160 AS len FROM ids),
      |s AS (SELECT aud_id, i, ((aud_id * 37 + i * 131) % 65536) - 32768 AS v, i // 160 AS frame
      |      FROM lens, unnest(generate_series(0, len - 1)) AS u(i)),
      |w AS (SELECT aud_id, frame, i, v,
      |             lag(v) OVER (PARTITION BY aud_id, frame ORDER BY i) AS pv
      |      FROM s)
      |SELECT CAST(aud_id AS BIGINT) AS aud_id, CAST(frame AS INT) AS frame,
      |       CAST(COUNT(*) AS INT) AS n_samples,
      |       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
      |       CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0) THEN 1 ELSE 0 END) AS INT) AS n_zero_cross
      |FROM w GROUP BY aud_id, frame""".stripMargin

  private val imageResizeOracleSql: String =
    """WITH ids AS (SELECT unnest(generate_series(0, 39)) AS img_id),
      |dims AS (SELECT img_id, 16 + img_id % 7 AS w, 12 + img_id % 5 AS h FROM ids),
      |px AS (SELECT img_id, w, h, ux.x AS x, uy.y AS y
      |       FROM dims, unnest(generate_series(0, w - 1)) AS ux(x),
      |                  unnest(generate_series(0, h - 1)) AS uy(y)),
      |m AS (SELECT img_id, x * 8 // w AS ox, y * 6 // h AS oy,
      |        (img_id * 31 + x * 7 + y * 13) % 256 AS r,
      |        (img_id * 17 + x * 3 + y * 11) % 256 AS g,
      |        (img_id * 23 + x * 5 + y * 19) % 256 AS b
      |      FROM px)
      |SELECT CAST(img_id AS BIGINT) AS img_id, CAST(ox AS INT) AS x, CAST(oy AS INT) AS y,
      |       CAST(SUM(r) // COUNT(*) AS INT) AS r,
      |       CAST(SUM(g) // COUNT(*) AS INT) AS g,
      |       CAST(SUM(b) // COUNT(*) AS INT) AS b
      |FROM m GROUP BY img_id, ox, oy""".stripMargin

  /** G2 zero-phase filtering per user signal (oracle: generated
    * recursive-CTE biquad — see filtfiltOracleSql). */
  private def qFiltfilt(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "value")
    val sos = graft.dsp.FilterDesign.butter(2, Seq(0.25), graft.dsp.FilterDesign.Lowpass)
    graft.dsp.SosFiltFilt
      .filtfiltPerSegment(ev, sos, Seq("user_id"), "event_id", "value")
      .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value"))
  }

  /** F5 sub-sample alignment of gathered patches (rows-only: cubic
    * spline). */
  private def qAlign(s: SparkSession, dir: String): DataFrame = {
    val patches = qPatchExtract(s, dir)
    val wf = patches
      .groupBy("peak_idx")
      .agg(
        transform(
          array_sort(collect_list(struct(col("offset"), col("value")))),
          s => array(s.getField("value"))
        ).as("waveform")
      )
      // full 6-sample patches only (edge peaks would have shorter
      // waveforms; the unrolled spline oracle assumes k = 6)
      .where(size(col("waveform")) === 6)
    graft.align.Align
      .alignColumn(wf, "waveform", sBefore = 2, sAfter = 2)
      .select(
        col("peak_idx"),
        posexplode(flatten(col("waveform"))).as(Seq("sample_idx", "value"))
      )
      .withColumn("value", round(col("value"), 6))
  }

  /** Exact embedding near-dup pairs above a cosine threshold, blocked by
    * label. */
  private def qEmbedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.blockedNearDupPairs(Tables.embeddings(s, dir), "label", minCosine = 0.3)

  /** Sign-LSH near-dup pairs: random-hyperplane sign buckets → candidate
    * equi-join on bucket → exact cosine filter. The bucket scan is one
    * pass; candidate generation shuffles on the bucket key — no n² pair
    * set (the 100 TB path of blockedNearDupPairs when no natural block
    * column exists). */
  private def qSignLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(s, dir), dim = 64, numPlanes = 8, minCosine = 0.3)

  /** IVF ANN with full probing (nProbe == nLists) — must equal the exact
    * brute-force top-k, which is what the oracle checks; the machinery
    * (centroid training, cell assignment, probe ranking, bucket join) is
    * exactly what runs with nProbe < nLists at scale. */
  private def qIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Ivf.topK(e, e.where(col("vec_id") < 5), k = 10, nLists = 8, nProbe = 8)
  }

  /** IVF index cache for [[qIvfServe]]: built ONCE per sf dir and
    * MATERIALIZED to a temp parquet rather than `.persist()` — the bench
    * clears the RDD/relation cache between runs, and a real deployment
    * likewise writes the index out once and serves many query batches
    * from it. First bench repeat pays the build; the median-of-3 then
    * reflects steady-state serving cost (the number q_ivf_topk — which
    * re-trains inside the timed window — deliberately does NOT show). */
  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  // temp index dirs are reclaimed at JVM exit (File.deleteOnExit can't
  // remove non-empty dirs); the cache key is the sf dir PATH only, so a
  // REGENERATED sf dir within one JVM would serve a stale index — fine
  // for the bench/verify drivers, which generate data before launching
  private val ivfTempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      ivfTempDirs.forEach { base =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(base).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => () })
        } catch { case _: Exception => () }
      }))
  }
  private def ivfIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (aPath, cPath) = ivfIndexCache.getOrElseUpdate(dir, {
      val baseDir = java.nio.file.Files.createTempDirectory("graft-ivf-")
      ivfTempDirs.add(baseDir)
      val base = baseDir.toString
      val (assigned, centroids) = Ivf.assignCells(Tables.embeddings(s, dir), nLists = 8)
      val ap = s"$base/assigned.parquet"
      val cp = s"$base/centroids.parquet"
      // partition the index BY CELL: serving joins on cell against a
      // small broadcast probe side, so dynamic partition pruning reads
      // only the probed cells' files — O(nProbe/nLists) of the index I/O
      // at corpus scale (plan-asserted in PlanShapeSpec)
      assigned.write.mode("overwrite").partitionBy("cell").parquet(ap)
      centroids.write.mode("overwrite").parquet(cp)
      (ap, cp)
    })
    (s.read.parquet(aPath), s.read.parquet(cPath))
  }

  /** IVF ANN SERVING over a pre-built index ([[Ivf.assignCells]] →
    * parquet, read back): times only [[Ivf.topKIndexed]] after the first
    * repeat. Full probing (nProbe == nLists) keeps the same exact
    * brute-force oracle as q_ivf_topk. */
  private def qIvfServe(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centroids) = ivfIndex(s, dir)
    val queries = Tables.embeddings(s, dir).where(col("vec_id") < 5)
    Ivf.topKIndexed(assigned, centroids, queries, k = 10, nProbe = 8)
  }

  /** Binary-quantization serving ([[graft.ops.Bq.topKBinaryIndexed]]):
    * sign-bit codes → Hamming top-50 shortlist → exact f32 rerank →
    * top-10, over the same pre-built IVF index as q_ivf_serve at full
    * probing. The R = 50 shortlist makes the Hamming stage LOAD-
    * BEARING (any pack/xor/bit_count/tie-break bug changes the
    * result); the oracle replays the identical pack + Hamming + rank +
    * rerank chain in SQL — cells never enter it (full probing is
    * exhaustive). */
  private def qBqServe(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centroids) = ivfIndex(s, dir)
    val queries = Tables.embeddings(s, dir).where(col("vec_id") < 5)
    graft.ops.Bq.topKBinaryIndexed(
      assigned, centroids, queries, dim = 64, k = 10, nProbe = 8, hammingR = 50)
  }

  // same lifecycle as ivfIndexCache (shared shutdown-hook cleanup, same
  // same-session staleness note); codebooks/centroids live with the path
  private val ivfPqCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, Array[Array[Double]], Array[Array[Array[Double]]])]
  private def ivfPqIndex(
      s: SparkSession,
      dir: String
  ): (String, Array[Array[Double]], Array[Array[Array[Double]]]) =
    ivfPqCache.getOrElseUpdate(dir, {
      val baseDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-")
      ivfTempDirs.add(baseDir)
      val e = Tables.embeddings(s, dir)
      val cents = Ivf.trainCentroids(e, nLists = 16, iters = 6)
      val cb = Pq.trainResidual(e, cents, m = 4, ksub = 16, iters = 6)
      val p = s"${baseDir.toString}/codes.parquet"
      // cell-partitioned codes: the probed-cell static IN-filter prunes
      // to the probed cells' files at planning time
      Pq.encodeIvfPq(e, cents, cb)
        .select(col("vec_id"), col("cell"), col("code"))
        .write.mode("overwrite").partitionBy("cell").parquet(p)
      (p, cents, cb)
    })

  /** IVF-PQ SERVING over a pre-built cell-partitioned codes index: times
    * only the probed-cell ADC scan + shortlist re-rank, the steady-state
    * cost (training + encode paid once per corpus, like q_ivf_serve).
    * Same parameters as q_ivfpq_topk, so results are identical. */
  private def qIvfPqServe(s: SparkSession, dir: String): DataFrame = {
    val (p, cents, cb) = ivfPqIndex(s, dir)
    ivfPqOracleArtifacts = Some((cents, cb))
    Pq.ivfPqTopK(
      s.read.parquet(p), Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).where(col("vec_id") < 5),
      cents, cb, k = 10, nProbe = 4, rerank = 4)
  }

  /** SemDeDup semantic dedup: k-means cells (the IVF trainer), pairwise
    * cosine WITHIN a cell only, keep-lowest-id. The centroids are
    * recorded for the generated oracle (the PQ-family recipe). */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    val (result, cents) =
      SemDedup.semDedup(Tables.embeddings(s, dir), nLists = 8, minCosine = 0.3)
    semDedupOracleArtifacts = Some(cents)
    result
  }

  /** Per-source token-budget sampling: every source capped at 600
    * tokens, docs taken in the deterministic hash order. */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame =
    Mixture.tokenBudgetPerSource(Tables.documents(s, dir), budgetTokens = 600L, salt = "tb1")

  /** Hashed-linear quality classifier: distill the stopword-ratio gate
    * into 4096 hashed unigram-frequency features + logistic regression
    * (deterministic driver-side training on a content-hash sample),
    * then score the whole corpus in one generate + one combine. The
    * trained model is recorded for the generated oracle. */
  private def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nTok = size(split(col("text"), " ")).cast("double")
    val nStop = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(Seq("the", "a")))
      .getItem(0)
      .cast("double")
    val model = QualityClassifier.train(docs, nStop / nTok >= 0.05)
    qcOracleArtifacts = Some(model)
    QualityClassifier.score(docs, model)
  }

  /** DSIR importance resampling: hashed-unigram target (lang='en') vs
    * background log-likelihood-ratio scores, top-50 selection. The
    * estimated bucket weights are recorded for the generated oracle
    * (the trained-artifact recipe). */
  private def qDsir(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = Dsir.train(docs, col("lang") === "en", numBuckets = 1024, salt = "dsir0")
    dsirOracleArtifacts = Some(w)
    Dsir.resample(docs, w, k = 50)
  }

  /** DSIR with Xie et al.'s full hashed-n-gram estimator (unigrams +
    * adjacent bigrams, `gramSize = 2`) — the word-order-aware variant;
    * same one-aggregate training and constant-folded scoring shape. */
  private def qDsirBigram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = Dsir.train(docs, col("lang") === "en",
      numBuckets = 1024, salt = "dsir2", gramSize = 2)
    dsir2OracleArtifacts = Some(w)
    Dsir.resample(docs, w, k = 50)
  }

  /** A4 common average reference + CAR-subtracted samples on the
    * synthetic 4-channel signal. */
  private def qCar(s: SparkSession, dir: String): DataFrame = {
    val chans = Tables
      .events(s, dir)
      .select(
        expr("event_id div 4").as("idx"),
        (col("event_id") % 4).as("channel"),
        col("value")
      )
    Spikes
      .subtractCar(chans, "idx", "value")
      .select(col("idx"), col("channel"), round(col("value"), 6).as("value"))
  }

  /** Zero-phase FIR smoothing (linear-phase windowed-sinc lowpass) as
    * pure window arithmetic — the declarative, oracle-checkable dual of
    * the IIR sosfiltfilt kernel (q_filtfilt). Keyed by user. */
  private val firTaps = graft.dsp.Fir.lowpassCoeffs(numTaps = 9, cutoff = 0.25)
  private def qFirSmooth(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "value")
    graft.dsp.Fir
      .zeroPhase(ev, firTaps, Seq("user_id"), "event_id", "value")
      .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value"))
  }

  /** G4 anti-aliased FIR decimation: lowpass at 0.8/q Nyquist, then every
    * q-th row per user — fully declarative, oracle-checked (unlike the
    * IIR-prefiltered Decimate.decimate, whose kernel is rows-only). */
  private val DecQ = 4
  private val decTaps = graft.dsp.Fir.lowpassCoeffs(numTaps = 9, cutoff = 0.8 / DecQ)
  private def qDecimateFir(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "value")
    graft.dsp.Fir
      .decimateFir(ev, DecQ, numTaps = 9, Seq("user_id"), "event_id", "value")
      .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value"))
  }

  /** DuckDB oracle for q_filtfilt, GENERATED from the live single-biquad
    * design so the constants cannot drift from the Scala kernel. The IIR
    * recurrence runs as two recursive CTEs (forward + backward pass) over
    * row-wise (user, position, sample) streams; odd-extension padding and
    * steady-state zi init mirror SosFiltFilt.filtfilt exactly, and every
    * upstream CTE is MATERIALIZED (DuckDB re-evaluates plain CTEs each
    * recursion round — 0.3s vs 77s). Verified bit-identical at 6dp on all
    * rows. Assumes every group has > 1 sample (true for the events
    * table; the kernel's len<=1 passthrough has no SQL analog here). */
  /** Shared oracle for q_ivf_topk and q_ivf_serve: at nProbe == nLists
    * IVF probing is EXACT, so both reduce to the brute-force top-k. */
  private val ivfOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |p AS (SELECT query_id, vec_id, qe, embedding AS ee FROM embeddings, q WHERE vec_id <> query_id),
      |u AS (SELECT query_id, vec_id, unnest(qe) AS qv, unnest(ee) AS ev FROM p),
      |d AS (SELECT query_id, vec_id,
      |        SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
      |        SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
      |        SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
      |      FROM u GROUP BY query_id, vec_id),
      |c AS (SELECT query_id, vec_id, round(dp / (sqrt(qq) * sqrt(ee2)), 6) AS cos_sim FROM d),
      |r AS (SELECT query_id, vec_id, cos_sim,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      |      FROM c)
      |SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10""".stripMargin

  private def filtfiltOracleSql: String = {
    val sos = graft.dsp.FilterDesign.butter(2, Seq(0.25), graft.dsp.FilterDesign.Lowpass)
    require(sos.length == 1, "oracle generator covers the single-section design")
    val s = sos.head
    val zi = graft.dsp.SosFiltFilt.sosfiltZi(sos).head
    val pad = graft.dsp.SosFiltFilt.defaultPadLen(sos)
    def d(v: Double) = s"CAST($v AS DOUBLE)"
    val (b0, b1, b2, a1, a2, zi0, zi1) =
      (d(s.b0), d(s.b1), d(s.b2), d(s.a1), d(s.a2), d(zi(0)), d(zi(1)))
    def stage(name: String, rows: String): String =
      s"""$name(user_id, i, y, z0, z1) AS (
         |  SELECT user_id, 1, yy,
         |         $b1 * xv - ($a1) * yy + $zi1 * xv,
         |         $b2 * xv - ($a2) * yy
         |  FROM (SELECT user_id, xv, $b0 * xv + $zi0 * xv AS yy FROM $rows WHERE i = 1)
         |  UNION ALL
         |  SELECT r.user_id, r.i + 1,
         |         $b0 * s.xv + r.z0,
         |         $b1 * s.xv - ($a1) * ($b0 * s.xv + r.z0) + r.z1,
         |         $b2 * s.xv - ($a2) * ($b0 * s.xv + r.z0)
         |  FROM $name r JOIN $rows s ON s.user_id = r.user_id AND s.i = r.i + 1
         |)""".stripMargin
    s"""WITH RECURSIVE s AS MATERIALIZED (
       |  SELECT user_id,
       |         list(value ORDER BY event_id) AS x,
       |         list(event_id ORDER BY event_id) AS eids
       |  FROM events GROUP BY user_id),
       |p AS MATERIALIZED (SELECT *, least($pad, len(x) - 1) AS pl, len(x) AS n FROM s),
       |e AS MATERIALIZED (SELECT user_id, eids, x, pl, n, n + 2 * pl AS cnt,
       |  list_concat(list_concat(
       |    list_transform(generate_series(0, pl - 1), i -> 2 * x[1] - x[pl - i + 1]),
       |    x),
       |    list_transform(generate_series(0, pl - 1), i -> 2 * x[-1] - x[len(x) - 1 - i])
       |  ) AS ext FROM p),
       |ee AS MATERIALIZED (SELECT user_id, unnest(generate_series(1, cnt)) AS i, unnest(ext) AS xv FROM e),
       |${stage("fw", "ee")},
       |rvr AS MATERIALIZED (SELECT fw.user_id AS user_id, e.cnt - fw.i + 1 AS i, fw.y AS xv
       |        FROM fw JOIN e ON fw.user_id = e.user_id),
       |${stage("bw", "rvr")},
       |eidx AS MATERIALIZED (SELECT user_id, unnest(generate_series(1, n)) AS m, unnest(eids) AS event_id FROM e)
       |SELECT ei.user_id AS user_id, ei.event_id AS event_id, round(bw.y, 6) AS value
       |FROM eidx ei
       |JOIN e ON e.user_id = ei.user_id
       |JOIN bw ON bw.user_id = ei.user_id AND bw.i = e.cnt - e.pl - ei.m + 1""".stripMargin
  }

  /** DuckDB oracle for q_align, GENERATED from the same math as the
    * Spline kernel (pole z1 = √3 − 2, its successive powers, the
    * backward-init constant) so the constants cannot drift. For the
    * fixed 6-sample waveforms the Unser forward/backward recursions and
    * the 4-point mirror-reflected basis evaluation UNROLL into plain
    * column arithmetic — every chained step is its own MATERIALIZED CTE
    * (DuckDB inlines lateral aliases textually; a 12-deep chain would
    * otherwise expand exponentially). Verified bit-identical at 6dp on
    * all rows at sf0.01 AND sf0.1. Known micro-divergence: an unreflected
    * vertex landing EXACTLY in |x| ∈ [2.147e9, 2^31+2] (kernel Int
    * saturation edge) — requires a denominator within ~1 ulp of zero;
    * both sides return 0 outside that sliver. */
  private def alignOracleSql: String = {
    val z1 = math.sqrt(3.0) - 2.0
    def d(v: Double) = s"CAST($v AS DOUBLE)"
    val pows = Array.iterate(1.0, 6)(_ * z1).map(d)
    val Z = d(z1)
    val K1 = d(z1 / (z1 - 1.0))
    val B23 = d(2.0 / 3.0)
    val ypStages =
      s"sp0 AS MATERIALIZED (SELECT *, w[1] + $Z * powerSum AS yp0 FROM pk)" +:
        (1 until 6).map(i =>
          s"sp$i AS MATERIALIZED (SELECT *, w[${i + 1}] + $Z * yp${i - 1} AS yp$i FROM sp${i - 1})"
        )
    val oStages =
      s"so5 AS MATERIALIZED (SELECT *, $K1 * yp5 AS o5 FROM sp5)" +:
        (4 to 0 by -1).map(i =>
          s"so$i AS MATERIALIZED (SELECT *, $Z * (o${i + 1} - yp$i) AS o$i FROM so${i + 1})"
        )
    // one reflection fold (|x| → then fold about 5) per stage. EXACTLY 64
    // stages — the kernel's guard count: a near-degenerate parabola can
    // put the vertex hundreds of samples out (each fold only walks it
    // back ~20), and a converged x is a fixed point of further folds, so
    // 64 unrolled stages reproduce the loop bit-for-bit in every case
    // (caught by an sf0.1 oracle sweep; 4 stages left one peak wrong).
    val reflGuard = 64
    val reflStages =
      "g0 AS MATERIALIZED (SELECT peak_idx, c1, c2, c3, c4, c5, c6, j, frac - 2.0 + CAST(j AS DOUBLE) AS xr FROM cf, (SELECT unnest(generate_series(0, 3)) AS j))" +:
        (1 to reflGuard).map { r =>
          s"g$r AS MATERIALIZED (SELECT peak_idx, c1, c2, c3, c4, c5, c6, j, " +
            "(CASE WHEN (CASE WHEN xr < 0 THEN -xr ELSE xr END) > 5.0 THEN 10.0 - (CASE WHEN xr < 0 THEN -xr ELSE xr END) ELSE (CASE WHEN xr < 0 THEN -xr ELSE xr END) END) AS xr " +
            s"FROM g${r - 1})"
        }
    def basis(t: String) =
      s"(CASE WHEN abs($t) < 1.0 THEN $B23 - abs($t)*abs($t) + abs($t)*abs($t)*abs($t)/2.0 " +
        s"WHEN abs($t) < 2.0 THEN (2.0 - abs($t))*(2.0 - abs($t))*(2.0 - abs($t))/6.0 ELSE 0.0 END)"
    val terms = (0 until 4)
      .map(i =>
        s"(CASE least(greatest(jl + $i, 0), 5) WHEN 0 THEN c1 WHEN 1 THEN c2 WHEN 2 THEN c3 WHEN 3 THEN c4 WHEN 4 THEN c5 ELSE c6 END) * " +
          basis(s"xr - CAST(jl + $i AS DOUBLE)")
      )
      .mkString(" + ")
    s"""WITH t AS MATERIALIZED (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
       |hits AS MATERIALIZED (SELECT event_id, value FROM events, t WHERE value > thr),
       |p AS MATERIALIZED (SELECT a.event_id AS peak_idx FROM hits a JOIN hits b ON a.event_id + 1 = b.event_id),
       |patch AS MATERIALIZED (SELECT p.peak_idx, e.event_id - p.peak_idx AS o, e.value AS v
       |          FROM events e JOIN p ON e.event_id >= p.peak_idx - 3 AND e.event_id < p.peak_idx + 3),
       |wf AS MATERIALIZED (SELECT peak_idx, list(v ORDER BY o) AS w FROM patch GROUP BY peak_idx HAVING COUNT(*) = 6),
       |pk0 AS MATERIALIZED (SELECT peak_idx, w,
       |         least(greatest(list_position(w, list_max(w)) - 1, 1), 4) AS pi FROM wf),
       |pk1 AS MATERIALIZED (SELECT *, CAST(pi AS DOUBLE) AS pd, w[pi] AS y0, w[pi + 1] AS y1, w[pi + 2] AS y2 FROM pk0),
       |pk2 AS MATERIALIZED (SELECT *,
       |         y0 / 2.0 + y1 / (-1.0) + y2 / 2.0 AS a,
       |         -(y0 * (pd + (pd + 1.0)) / 2.0 + y1 * ((pd - 1.0) + (pd + 1.0)) / (-1.0) + y2 * ((pd - 1.0) + pd) / 2.0) AS b
       |       FROM pk1),
       |pk AS MATERIALIZED (SELECT *, -b / (2.0 * a) AS frac,
       |         ((((( 0.0 + ${pows(0)} * w[1]) + ${pows(1)} * w[2]) + ${pows(2)} * w[3]) + ${pows(3)} * w[4]) + ${pows(4)} * w[5]) + ${pows(5)} * w[6] AS powerSum
       |       FROM pk2),
       |${ypStages.mkString(",\n")},
       |${oStages.mkString(",\n")},
       |cf AS MATERIALIZED (SELECT peak_idx, frac, o0 * 6.0 AS c1, o1 * 6.0 AS c2, o2 * 6.0 AS c3, o3 * 6.0 AS c4, o4 * 6.0 AS c5, o5 * 6.0 AS c6 FROM so0),
       |${reflStages.mkString(",\n")},
       |gj AS MATERIALIZED (SELECT *,
       |  CASE WHEN isfinite(xr) AND abs(xr) < 2147483000.0
       |       THEN CAST(floor(xr - 2.0) AS INT) + 1 ELSE 1 END AS jl FROM g$reflGuard)
       |SELECT peak_idx, j AS sample_idx, round($terms, 6) AS value FROM gj""".stripMargin
  }

  // ---- PQ-family generated oracles ------------------------------------
  // The q_align/q_filtfilt recipe applied to the ANN stack: the trained
  // codebooks/centroids are driver-side arrays, recorded when the query
  // runs and constant-folded into DuckDB VALUES tables, so "k-means ∉
  // SQL" stops being an oracle gap. Verify runs EVERY query before it
  // dumps oracle_sql.json, so the artifacts are always populated there;
  // before any run the map simply omits the three entries.
  @volatile private var pqOracleArtifacts: Option[Array[Array[Array[Double]]]] = None
  @volatile private var ivfPqOracleArtifacts
      : Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None
  @volatile private var semDedupOracleArtifacts: Option[Array[Array[Double]]] = None
  @volatile private var qcOracleArtifacts: Option[QualityClassifier.Model] = None
  @volatile private var dsirOracleArtifacts: Option[Dsir.Weights] = None
  @volatile private var dsir2OracleArtifacts: Option[Dsir.Weights] = None
  @volatile private var bpeOracleMerges: Option[Seq[(String, String)]] = None
  @volatile private var pcaOracleArtifacts: Option[Pca.Model] = None

  private def dbl(v: Double): String = s"CAST($v AS DOUBLE)"

  /** Shared tail: ADC shortlist (rank ≤ k·rerank on the 6dp-rounded ADC
    * distance, vec_id tiebreak) → fetch shortlist vectors → exact
    * squared-L2 re-rank, spelled xx + qq − 2·dp exactly like
    * [[Pq.adcTopKReranked]]'s rerank. Expects an `adc` CTE with
    * (query_id, vec_id, adc_dist). */
  private def pqRerankSqlTail(k: Int, rerank: Int): String =
    s"""sl AS MATERIALIZED (SELECT query_id, vec_id FROM
       |        (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) AS rn FROM adc)
       |      WHERE rn <= ${k * rerank}),
       |pr AS MATERIALIZED (SELECT s.query_id, s.vec_id, a.embedding AS ea, b.embedding AS qe
       |      FROM sl s JOIN embeddings a ON a.vec_id = s.vec_id
       |                JOIN embeddings b ON b.vec_id = s.query_id),
       |uu AS (SELECT query_id, vec_id, unnest(ea) AS x, unnest(qe) AS y FROM pr),
       |l2 AS (SELECT query_id, vec_id,
       |        round(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) + SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
       |              - 2 * SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 6) AS l2_dist
       |      FROM uu GROUP BY query_id, vec_id)
       |SELECT query_id, vec_id, l2_dist, rank FROM
       |  (SELECT query_id, vec_id, l2_dist, row_number() OVER (PARTITION BY query_id ORDER BY l2_dist ASC, vec_id ASC) AS rank FROM l2)
       |WHERE rank <= $k""".stripMargin

  /** q_pq_topk oracle: codebooks as a (s, c, j, w) VALUES table; codes
    * via per-(vec, subspace) argmin; and — because the queries ARE
    * corpus rows — the per-query ADC LUT is the SAME argmin-distance
    * table restricted to query ids. */
  private def pqOracleSql(
      cb: Array[Array[Array[Double]]],
      k: Int,
      rerank: Int
  ): String = {
    val m = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    val dim = m * dsub
    val vals = (for { s <- 0 until m; c <- 0 until ksub; j <- 0 until dsub }
      yield s"($s,$c,$j,${dbl(cb(s)(c)(j))})").mkString(",")
    s"""WITH cb(s, c, j, w) AS MATERIALIZED (VALUES $vals),
       |comp AS MATERIALIZED (SELECT vec_id, unnest(generate_series(0, ${dim - 1})) AS jj,
       |        unnest(embedding) AS v FROM embeddings),
       |cd AS MATERIALIZED (SELECT vec_id, cb.s, cb.c,
       |        SUM((CAST(v AS DOUBLE) - w) * (CAST(v AS DOUBLE) - w)) AS dist
       |      FROM comp JOIN cb ON cb.s = jj // $dsub AND cb.j = jj % $dsub
       |      GROUP BY vec_id, cb.s, cb.c),
       |codes AS MATERIALIZED (SELECT vec_id, s, c FROM
       |        (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, c ASC) AS rn FROM cd)
       |      WHERE rn = 1),
       |adc AS MATERIALIZED (SELECT q.vec_id AS query_id, cs.vec_id AS vec_id, round(SUM(q.dist), 6) AS adc_dist
       |      FROM codes cs JOIN (SELECT * FROM cd WHERE vec_id < 5) q ON q.s = cs.s AND q.c = cs.c
       |      WHERE cs.vec_id <> q.vec_id
       |      GROUP BY q.vec_id, cs.vec_id),
       |${pqRerankSqlTail(k, rerank)}""".stripMargin
  }

  /** q_ivfpq_topk / q_ivfpq_serve oracle (identical parameters ⇒ one
    * SQL): coarse centroids + residual codebooks as VALUES tables; cell
    * assignment and probe ranking as argmin/rank windows over the same
    * per-(vec, cell) distance CTE; per-(query, cell) RESIDUAL LUTs keep
    * ADC comparable across cells, exactly like [[Pq.ivfPqTopK]]. */
  private def ivfPqOracleSql(
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      k: Int,
      nProbe: Int,
      rerank: Int
  ): String = {
    val m = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    val dim = m * dsub
    val ctVals = (for { cell <- cents.indices; j <- 0 until dim }
      yield s"($cell,$j,${dbl(cents(cell)(j))})").mkString(",")
    val cbVals = (for { s <- 0 until m; c <- 0 until ksub; j <- 0 until dsub }
      yield s"($s,$c,$j,${dbl(cb(s)(c)(j))})").mkString(",")
    s"""WITH ct(cell, j, w) AS MATERIALIZED (VALUES $ctVals),
       |cbt(s, c, j, w) AS MATERIALIZED (VALUES $cbVals),
       |comp AS MATERIALIZED (SELECT vec_id, unnest(generate_series(0, ${dim - 1})) AS jj,
       |        unnest(embedding) AS v FROM embeddings),
       |cdist AS MATERIALIZED (SELECT vec_id, cell,
       |        SUM((CAST(v AS DOUBLE) - w) * (CAST(v AS DOUBLE) - w)) AS dist
       |      FROM comp JOIN ct ON ct.j = jj GROUP BY vec_id, cell),
       |acell AS MATERIALIZED (SELECT vec_id, cell FROM
       |        (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM cdist)
       |      WHERE rn = 1),
       |rcomp AS MATERIALIZED (SELECT comp.vec_id AS vec_id, jj, CAST(v AS DOUBLE) - w AS rv
       |      FROM comp JOIN acell ON acell.vec_id = comp.vec_id
       |                JOIN ct ON ct.cell = acell.cell AND ct.j = comp.jj),
       |rcd AS MATERIALIZED (SELECT vec_id, cbt.s, cbt.c, SUM((rv - w) * (rv - w)) AS dist
       |      FROM rcomp JOIN cbt ON cbt.s = jj // $dsub AND cbt.j = jj % $dsub
       |      GROUP BY vec_id, cbt.s, cbt.c),
       |codes AS MATERIALIZED (SELECT vec_id, s, c FROM
       |        (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, c ASC) AS rn FROM rcd)
       |      WHERE rn = 1),
       |probed AS MATERIALIZED (SELECT vec_id AS query_id, cell FROM
       |        (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM cdist WHERE vec_id < 5)
       |      WHERE rn <= $nProbe),
       |qr AS MATERIALIZED (SELECT p.query_id, p.cell, jj, CAST(v AS DOUBLE) - w AS rv
       |      FROM probed p JOIN comp ON comp.vec_id = p.query_id
       |                    JOIN ct ON ct.cell = p.cell AND ct.j = comp.jj),
       |qlut AS MATERIALIZED (SELECT query_id, cell, cbt.s, cbt.c, SUM((rv - w) * (rv - w)) AS lut
       |      FROM qr JOIN cbt ON cbt.s = jj // $dsub AND cbt.j = jj % $dsub
       |      GROUP BY query_id, cell, cbt.s, cbt.c),
       |adc AS MATERIALIZED (SELECT q.query_id AS query_id, a.vec_id AS vec_id, round(SUM(q.lut), 6) AS adc_dist
       |      FROM acell a JOIN codes cs ON cs.vec_id = a.vec_id
       |           JOIN qlut q ON q.cell = a.cell AND q.s = cs.s AND q.c = cs.c
       |      WHERE a.vec_id <> q.query_id
       |      GROUP BY q.query_id, a.vec_id),
       |${pqRerankSqlTail(k, rerank)}""".stripMargin
  }

  /** q_semdedup oracle: trained centroids as a VALUES table, cell
    * assignment as the same argmin/rank window as the IVF-PQ oracle,
    * then pairwise cosine restricted to same-cell smaller-id pairs and
    * the keep-lowest-id verdict — [[graft.ops.SemDedup]] in SQL. */
  private def semDedupOracleSql(cents: Array[Array[Double]], minCosine: Double): String = {
    val dim = cents(0).length
    val ctVals = (for { cell <- cents.indices; j <- 0 until dim }
      yield s"($cell,$j,${dbl(cents(cell)(j))})").mkString(",")
    s"""WITH ct(cell, j, w) AS MATERIALIZED (VALUES $ctVals),
       |comp AS MATERIALIZED (SELECT vec_id, unnest(generate_series(0, ${dim - 1})) AS jj,
       |        unnest(embedding) AS v FROM embeddings),
       |cdist AS MATERIALIZED (SELECT vec_id, cell,
       |        SUM((CAST(v AS DOUBLE) - w) * (CAST(v AS DOUBLE) - w)) AS dist
       |      FROM comp JOIN ct ON ct.j = jj GROUP BY vec_id, cell),
       |acell AS MATERIALIZED (SELECT vec_id, cell FROM
       |        (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM cdist)
       |      WHERE rn = 1),
       |nr AS MATERIALIZED (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
       |      FROM comp GROUP BY vec_id),
       |p AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb
       |      FROM acell a JOIN acell b ON a.cell = b.cell AND a.vec_id > b.vec_id),
       |pr AS MATERIALIZED (SELECT p.va, p.vb, ea.embedding AS xa, eb.embedding AS xb
       |      FROM p JOIN embeddings ea ON ea.vec_id = p.va
       |             JOIN embeddings eb ON eb.vec_id = p.vb),
       |uu AS (SELECT va, vb, unnest(xa) AS x, unnest(xb) AS y FROM pr),
       |dp AS (SELECT va, vb, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS d FROM uu GROUP BY va, vb),
       |cs AS (SELECT va, vb, round(d / (na.nrm * nb.nrm), 6) AS cos_sim
       |      FROM dp JOIN nr na ON na.vec_id = va JOIN nr nb ON nb.vec_id = vb),
       |dups AS (SELECT va AS vec_id, MIN(vb) AS dup_of FROM cs
       |      WHERE cos_sim >= ${dbl(minCosine)} GROUP BY va)
       |SELECT a.vec_id, a.cell,
       |       CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       |       COALESCE(d.dup_of, -1) AS dup_of
       |FROM acell a LEFT JOIN dups d ON d.vec_id = a.vec_id""".stripMargin
  }

  /** The generated-oracle entries (PQ family + SemDeDup), present once
    * the queries have trained (i.e. always, under Verify's
    * run-then-dump order). */
  private def pqFamilyOracles: Map[String, String] =
    pqOracleArtifacts.map(cb => "q_pq_topk" -> pqOracleSql(cb, k = 10, rerank = 4)).toMap ++
      ivfPqOracleArtifacts.map { case (cents, cb) =>
        val sql = ivfPqOracleSql(cents, cb, k = 10, nProbe = 4, rerank = 4)
        Map("q_ivfpq_topk" -> sql, "q_ivfpq_serve" -> sql)
      }.getOrElse(Map.empty[String, String]) ++
      semDedupOracleArtifacts
        .map(c => "q_semdedup" -> semDedupOracleSql(c, minCosine = 0.3)).toMap ++
      qcOracleArtifacts
        .map(m => "q_quality_classifier" -> QualityClassifier.scoreSql(m)).toMap ++
      dsirOracleArtifacts
        .map(w => "q_dsir" -> Dsir.scoreSql(w, k = 50)).toMap ++
      dsir2OracleArtifacts
        .map(w => "q_dsir_bigram" -> Dsir.scoreSql(w, k = 50)).toMap ++
      bpeOracleMerges
        .map(m => "q_bpe_encode" -> bpeOracleSql(m)).toMap ++
      pcaOracleArtifacts
        .map(m => "q_pca_project" -> Pca.projectSql(m)).toMap ++
      isotonicOracleArtifacts
        .map(f => "q_isotonic" -> isotonicOracleSql(f)).toMap ++
      isotonicScoreOracleArtifacts
        .map(f => "q_isotonic_score" -> isotonicScoreOracleSql(f)).toMap

  /** BPE-ish regex token counting over documents (pre-tokenizer run
    * counts per character class + punctuation ratio). */
  private def qTokenBpe(s: SparkSession, dir: String): DataFrame =
    Text.regexTokenStats(Tables.documents(s, dir))

  /** TRAINED-subword segmentation ([[Bpe]]): corpus-trained merges
    * (dict-bounded driver loop over one O(distinct words) exchange)
    * applied by the zero-shuffle native kernel. The merge list is
    * recorded so [[oracleSql]] can generate the bit-equivalent
    * delimited replace-chain (each symbol as `<sym>`, one `replace`
    * per rank — the delimiters make string replace exactly the
    * non-overlapping adjacent-SYMBOL merge, immune to the
    * suffix-boundary false match a bare space join would allow). */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, numMerges = 30)
    bpeOracleMerges = Some(merges)
    Bpe.encode(docs, merges)
  }

  /** Generated oracle for q_bpe_encode (see [[qBpeEncode]]). */
  private def bpeOracleSql(merges: Seq[(String, String)]): String = {
    def esc(x: String) = x.replace("'", "''")
    val chain = merges.foldLeft("regexp_replace(w, '(.)', '<\\1>', 'g')") {
      case (acc, (a, b)) => s"replace($acc, '<${esc(a)}><${esc(b)}>', '<${esc(a)}${esc(b)}>')"
    }
    s"""WITH words AS (SELECT doc_id, i, t[i] AS w
       |               FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |               unnest(generate_series(1, len(t))) AS g(i)),
       |tok AS (SELECT doc_id, i, trim(replace($chain, '><', ' '), '<>') AS s FROM words)
       |SELECT doc_id,
       |       string_agg(s, ' ' ORDER BY i) AS text_bpe,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(len(string_split(string_agg(s, ' ' ORDER BY i), ' ')) AS BIGINT) AS n_tokens
       |FROM tok GROUP BY doc_id""".stripMargin
  }

  /** F5 linear-mode sub-sample alignment expressed COLUMN-NATIVELY
    * (argmax → parabola vertex → clamped linear resample) — the engine-
    * preferred form of the alignment math, fully oracle-checkable. The
    * cubic path stays in the Spline kernel (q_align, rows-only). */
  private def qAlignLinear(s: SparkSession, dir: String): DataFrame = {
    val patches = qPatchExtract(s, dir)
    val wf = patches
      .groupBy("peak_idx")
      .agg(
        transform(
          array_sort(collect_list(struct(col("offset"), col("value")))),
          x => x.getField("value")
        ).as("w")
      )
      .where(size(col("w")) === 6)
    val denom = col("ym") - lit(2) * col("y0") + col("yp")
    wf.withColumn(
        "i",
        least(greatest(expr("array_position(w, array_max(w))").cast("int") - 1, lit(1)), lit(4))
      )
      .withColumn("ym", expr("element_at(w, i)"))
      .withColumn("y0", expr("element_at(w, i + 1)"))
      .withColumn("yp", expr("element_at(w, i + 2)"))
      .withColumn(
        "frac",
        when(denom === 0, col("i").cast("double"))
          .otherwise(col("i") + lit(0.5) * (col("ym") - col("yp")) / denom)
      )
      .withColumn("j", explode(sequence(lit(0), lit(3))))
      .withColumn("x", least(greatest(col("frac") - 2 + col("j"), lit(0.0)), lit(5.0)))
      .withColumn("lo", floor(col("x")).cast("int") + 1)
      .withColumn("hi", least(col("lo") + 1, lit(6)))
      .withColumn(
        "v",
        expr("element_at(w, lo) + (x - floor(x)) * (element_at(w, hi) - element_at(w, lo))")
      )
      .select(col("peak_idx"), col("j").as("sample_idx"), round(col("v"), 6).as("value"))
  }

  // ---- `.rec` binary-source chain, inside the hard oracle signal ------
  // DuckDB cannot read `.rec`, so these three run the REAL scan/extract
  // pipeline over the reference's sample recordings + the deterministic
  // RecFixture files, while the oracle re-implements the semantics in
  // SQL over the raw decoded packets as an inline VALUES twin (the
  // q_align / q_pq generated-oracle recipe). Covers S1-S5/P1-P3/A1/A2
  // plus the sanitize chain U2/W1/F1/F9/F13/O3/J2/U1 on real `.rec`
  // bytes. Reference semantics: jagular/io.py:88-193, utils.py:392-549.

  private val recSamplePaths: Seq[String] =
    (1 to 5).map(i => s"/root/reference/sample_data/sample_data_$i.rec")

  /** A1/O1: per-file catalog (2-packet bounds read + packet-count from
    * file size), checked against a FULL decode of every packet — the
    * bounds shortcut and the streaming decoder must agree. */
  private def qRecCatalog(s: SparkSession, dir: String): DataFrame =
    RecScan
      .catalog(s, recSamplePaths)
      .select(col("file_rank"), col("start_ts"), col("stop_ts"), col("n_packets"))

  /** A2: session summary over the catalog. */
  private def qRecSession(s: SparkSession, dir: String): DataFrame =
    RecScan
      .sessionSummary(RecScan.catalog(s, recSamplePaths))
      .select(
        col("start_ts"),
        col("stop_ts"),
        col("duration_w_gaps"),
        col("duration_wo_gaps"),
        col("n_packets")
      )

  /** F13/G-chain: full extract_channels over the planted-shape fixture —
    * stitched multi-file scan → dedup-keep-first → sessionize → linear
    * gap fill (int16 truncation) → per-channel explode, all on real
    * `.rec` bytes through the zero-shuffle sorted path. */
  private def qRecExtract(s: SparkSession, dir: String): DataFrame =
    ExtractChannels.extract(s, RecFixture.ensure(), maxGapSize = RecFixture.maxGapSize)

  /** F6 bit→µV scaling over the extracted `.rec` chain (the 4096/2¹⁵
    * SpikeGadgets constant, an exact 0.125 in binary — spelled
    * identically in the oracle). Puts F6 in the hard oracle signal. */
  private def qRecUv(s: SparkSession, dir: String): DataFrame =
    ExtractChannels
      .extract(s, RecFixture.ensure(), maxGapSize = RecFixture.maxGapSize)
      .select(
        col("ts"),
        col("channel"),
        round(graft.functions.Funcs.bitsToMicrovolts(col("value").cast("double")), 4).as("uv"))

  /** Deterministic MESSY URL per document — uppercase scheme/host,
    * default ports, tracking params, unsorted params, trailing slash,
    * fragment — every case [[graft.ops.Urls.normalizeUrl]] must fix.
    * Pure arithmetic in doc_id, so the oracle constructs the expected
    * CANONICAL form directly (it never runs the normalizer — a
    * normalization bug cannot cancel out). */
  private def messyUrl: org.apache.spark.sql.Column = concat(
    when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
    when(col("doc_id") % 3 === 0, lit("WWW.Example.COM"))
      .when(col("doc_id") % 3 === 1, lit("news.example.com"))
      .otherwise(lit("Blog.Other.ORG")),
    when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
    lit("/p/"), (col("doc_id") % 50).cast("string"),
    when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit("?utm_source=x&b=2&a=1"))
      .when(col("doc_id") % 5 === 1, lit("?b=2&a=1"))
      .when(col("doc_id") % 5 === 2, lit("?a=1&b=2&gclid=99"))
      .otherwise(lit("")),
    when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))

  /** URL canonicalization ([[graft.ops.Urls.normalizeUrl]]) + registrable
    * domain — stateless projection, zero shuffle. */
  private def qUrlNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      graft.ops.Urls.normalizeUrl(messyUrl).as("url_norm"),
      graft.ops.Urls.registrableDomain(messyUrl).as("domain"))

  /** Per-domain crawl rollup over the canonical URLs (pages, distinct
    * canonical URLs, dup rate) — one map-side-combinable aggregate. */
  private def qDomainStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.Urls.domainStats(
      Tables.documents(s, dir).withColumn("url", messyUrl), "url")

  /** PSL registrable domains + percent-encoding normalization, hard
    * oracle form: six URL shapes (pure arithmetic in doc_id) exercising
    * 2-label public suffixes (`co.uk`/`ac.jp`/`com.au`), a bare-suffix
    * host, userinfo + non-default port, unreserved escapes in both hex
    * cases, and a reserved `%2F` that must SURVIVE. The oracle states
    * the expected canonical form and domain LITERALLY per residue —
    * [[graft.ops.Urls.normalizeUrl]]/[[graft.ops.Urls
    * .registrableDomain]] never run on the oracle side, so a
    * normalization bug cannot cancel out. */
  private def qUrlCuration(s: SparkSession, dir: String): DataFrame = {
    val raw = when(col("doc_id") % 6 === 0, lit("HTTP://Shop.Example.CO.UK:80/p/%7Ealice/"))
      .when(col("doc_id") % 6 === 1, lit("https://a.b.News.AC.JP:443/x?%62=2&a=1"))
      .when(col("doc_id") % 6 === 2, lit("http://User:PW@www.Big.COM.AU:8080/%41%42"))
      .when(col("doc_id") % 6 === 3, lit("http://deep.sub.Other.ORG/a%2Fb?gclid=9&z=%7a"))
      .when(col("doc_id") % 6 === 4, lit("https://GOV.UK/services"))
      .otherwise(lit("http://example.com/%7e%30%39"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      graft.ops.Urls.normalizeUrl(raw).as("url_norm"),
      graft.ops.Urls.registrableDomain(raw).as("domain"))
  }

  /** Canonical-URL keep-first dedup ([[graft.ops.Urls.dedupByUrl]]):
    * the crawl-side exact dedup that runs before any content hash. */
  private def qUrlDedup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Urls
      .dedupByUrl(
        Tables.documents(s, dir).select(col("doc_id"), messyUrl.as("url")),
        "url", "doc_id")
      .select(col("doc_id"), graft.ops.Urls.normalizeUrl(col("url")).as("url_norm"))

  /** Domain authority over the crawl graph: [[qLinkGraph]]'s edge list
    * pushed through [[graft.ops.Graph.pagerank]] (5 iterations,
    * d = 0.85, link counts as weights) — the end-to-end crawl → graph
    * → authority chain a domain-quality prior comes from. The
    * `example.org` hub is a DANGLING node (no out-edges), so the
    * dangling-mass fold is exercised, not just covered. */
  private def qLinkAuthority(s: SparkSession, dir: String): DataFrame = {
    val edges = qLinkGraph(s, dir).select(
      col("src_domain").as("src"),
      col("dst_domain").as("dst"),
      col("n_links").cast("double").as("w"))
    Graph
      .pagerank(edges, iterations = 5, damping = 0.85, weightCol = Some("w"),
        // domainEdges output is a groupBy result — one row per (src, dst)
        assumeCollapsed = true)
      .select(col("node"), round(col("rank"), 6).as("pr"))
  }

  /** HITS hubs/authorities over the crawl link graph ([[qLinkGraph]]'s
    * edge list through [[graft.ops.Graph.hits]], 5 rounds, link counts
    * as weights) — the complementary signal to [[qLinkAuthority]]:
    * PageRank scores global visit probability, HITS separates
    * link-DIRECTORY quality (hub) from link-TARGET quality (authority).
    * `example.org` is a pure sink (no out-links), so its hub must
    * widen to exactly 0 while it competes on authority. */
  private def qHits(s: SparkSession, dir: String): DataFrame = {
    val edges = qLinkGraph(s, dir).select(
      col("src_domain").as("src"),
      col("dst_domain").as("dst"),
      col("n_links").cast("double").as("w"))
    Graph
      .hits(edges, iterations = 5, weightCol = Some("w"),
        // domainEdges output is a groupBy result — one row per (src, dst)
        assumeCollapsed = true)
      .select(
        col("node"),
        round(col("authority"), 6).as("authority"),
        round(col("hub"), 6).as("hub"))
  }

  /** Community detection ([[graft.ops.Graph.labelPropagation]]) over
    * the q_link_graph domain edge list, weighted by link multiplicity:
    * 3 synchronous rounds of max-weight/min-label updates over the
    * undirected view, self-loops excluded. The oracle unrolls the
    * identical 3 rounds term for term. */
  private def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val edges = qLinkGraph(s, dir).select(
      col("src_domain").as("src"),
      col("dst_domain").as("dst"),
      col("n_links").cast("double").as("w"))
    Graph.labelPropagation(edges, iterations = 3, weightCol = Some("w"))
  }

  /** Newman modularity of the LPA partition ([[graft.ops.Graph
    * .modularity]]) on the crawl link graph — the quality readout for
    * q_label_prop's communities: per-community degree/intra rollups
    * on LPA's own symmetrized view, cleared-form contributions from
    * integral-double sums (exact both engines). */
  private def qModularity(s: SparkSession, dir: String): DataFrame = {
    // the link-graph extraction subtree (regex tokenize + domain rollup
    // over documents) feeds BOTH the LPA replay and modularity's own
    // symmetrized rollup — persisted so the corpus scans once, not twice
    val edges = graft.util.CacheRegistry.track(
      qLinkGraph(s, dir).select(
        col("src_domain").as("src"),
        col("dst_domain").as("dst"),
        col("n_links").cast("double").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val labels = Graph.labelPropagation(edges, iterations = 3, weightCol = Some("w"))
    Graph.modularity(edges, labels, weightCol = Some("w"))
  }

  /** Join-skew advisor ([[graft.ops.SkewJoin.skewAdvisor]]) — the
    * per-key companion to [[qJoinSize]]'s total: for the
    * lineitem ⋈ lineitem supplier self-join (the part-co-occurrence
    * planning shape), every supplier key's two-side multiplicity,
    * exact DECIMAL fan-out, and the integral-ceil salt factor that
    * caps a reduce task at 100k output rows. ONE map-side-combinable
    * count per side; the corpora never meet — only the hot count rows
    * do. */
  private def qSkewAdvisor(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    graft.ops.SkewJoin.skewAdvisor(
      li, "l_suppkey", li, "l_suppkey",
      hotThreshold = 300L, targetPairsPerTask = 100000L)
      // n_a·n_b fits a long at any hot-key count a single task could
      // hold; BIGINT output per the no-raw-decimal contract.
      .withColumn("est_pairs", col("est_pairs").cast("long"))
  }

  /** One-pass data-quality profile ([[graft.ops.Profile.profile]]) —
    * the per-ingest-batch validation gate: completeness, KMV distinct,
    * range, and exact-decimal mean for four numeric and two string
    * columns of lineitem, ALL from ONE map-side-combinable aggregate
    * (one scan, not |columns| scans). Doubles are projected to
    * DECIMAL(18,2) first per the operator's determinism contract
    * (engine-stable string form for the distinct hash; exact sums). */
  private def qProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"),
      col("l_quantity").cast("decimal(18,2)").as("quantity"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"),
      col("l_discount").cast("decimal(18,2)").as("discount"),
      col("l_returnflag"),
      col("l_linestatus"))
    graft.ops.Profile.profile(
      li,
      numericCols = Seq("l_orderkey", "quantity", "price", "discount"),
      stringCols = Seq("l_returnflag", "l_linestatus"),
      k = 64)
  }

  /** Sorted-neighborhood dedup ([[graft.ops.Snm.matchPairs]], window 5,
    * maxDist 2) — the blocking family member with a DATA-INDEPENDENT
    * candidate count (exactly n·(w−1) minus the corpus tail; no hot
    * bucket to shed, unlike every hash scheme on adversarial keys).
    * Keys synthesize a record-linkage shape from doc_id arithmetic:
    * per base number, an exact form, a last-digit-substituted typo,
    * and a suffixed variant — the window sweeps them as sort
    * neighbors. The oracle replays the identical total order
    * (row_number over (key, doc_id)), windowed self-join, and
    * levenshtein verify. */
  private def qSnmDedup(s: SparkSession, dir: String): DataFrame = {
    val b = lpad((col("doc_id") % 100).cast("string"), 4, "0")
    val key = when(col("doc_id") % 3 === 0, concat(lit("rec "), b))
      .when(col("doc_id") % 3 === 1, concat(lit("rec "), substring(b, 1, 3), lit("x")))
      .otherwise(concat(lit("rec "), b, lit("z")))
    graft.ops.Snm.matchPairs(
      Tables.documents(s, dir).select(col("doc_id"), key.as("key")),
      "doc_id", "key", window = 5, maxDist = 2)
  }

  /** Distributed histogram quantiles
    * ([[graft.ops.Profile.histQuantiles]], 1000 buckets) over two
    * lineitem measures at three probabilities — the profile's
    * percentile arm WITHOUT a per-column sort: the exchange carries at
    * most columns × buckets combined rows at any corpus size, and the
    * estimator (lower edge of the first bucket reaching ⌈p·n⌉) is
    * deterministic, so the oracle replays every floor/width step. */
  private def qQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.histQuantiles(
      Tables.lineitem(s, dir).select(
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("price")),
      Seq("quantity", "price"), Seq(0.5, 0.9, 0.99), buckets = 1000)

  /** Last-touch attribution ([[graft.ops.AsOf.asofBackward]] composed
    * over the events stream): every purchase credited to the user's
    * most recent prior click, voided past a 1-hour lookback — the
    * classic marketing-attribution shape, and a second REAL consumer
    * of the generic as-of family beyond its synthetic fixture.
    * Same-timestamp touches collapse to max(event_id) on BOTH sides
    * (the q_asof_join tie recipe), so the pick is deterministic. */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val lookback = 3600000000L
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val touches = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("touch_event"))
      .withColumn("touch_ts", col("ts_us"))
    val inWin = col("touch_ts") >= col("ts_us") - lookback
    graft.ops.AsOf
      .asofBackward(purchases, touches, Seq("user_id"), "ts_us",
        valueCols = Seq("touch_event", "touch_ts"))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        when(inWin, col("touch_event")).as("touch_event"),
        when(inWin, col("ts_us") - col("touch_ts")).as("latency_us"))
  }

  /** Snapshot-drift gate ([[graft.ops.Profile.drift]]): "yesterday"
    * (even order keys) vs "today" (odd keys) with injected damage on
    * the today side — a fifth of prices go NULL (the column going
    * dark) and half the survivors shift +60000 (a real mean move) —
    * while o_custkey and the priority string stay statistically
    * identical and must NOT flag. Both arms of the gate fire on
    * `price`, neither on the controls. */
  private def qProfileDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val before = o.where(col("o_orderkey") % 2 === 0).select(
      col("o_totalprice").cast("decimal(18,2)").as("price"),
      col("o_custkey"), col("o_orderpriority"))
    val after = o.where(col("o_orderkey") % 2 === 1).select(
      when(col("o_orderkey") % 10 === 3, lit(null).cast("decimal(19,2)"))
        .otherwise(
          col("o_totalprice").cast("decimal(18,2)") +
            when(col("o_orderkey") % 4 === 1, lit(60000)).otherwise(lit(0)))
        .as("price"),
      col("o_custkey"), col("o_orderpriority"))
    graft.ops.Profile.drift(
      before, after,
      numericCols = Seq("price", "o_custkey"),
      stringCols = Seq("o_orderpriority"),
      k = 64, nullRateTol = 0.01, meanRelTol = 0.05)
  }

  /** Trailing point-in-time features ([[graft.ops.Features.trailing]],
    * 1-hour lookback): per event, count/sum/mean of `value` over the
    * user's STRICTLY prior events — the leakage-free backfill frame
    * (the upper bound excludes the event and its timestamp ties). ONE
    * user-key exchange, codegen'd RANGE window — no self-join. */
  private def qTrailingFeatures(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features
      .trailing(
        Tables.events(s, dir).select("event_id", "user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us", "value", lookbackUs = 3600000000L)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("n_prior"),
        // 2dp DECIMAL sum is double-exact; the output contract bans raw
        // decimals (the driver's hasher renders them per-engine).
        col("sum_prior").cast("double").as("sum_prior"), col("mean_prior"))

  /** k-anonymity audit ([[graft.ops.Privacy.kAnonymity]], k = 5) over
    * customer quasi-identifiers (nation, market segment, account-
    * balance band): every equivalence class with its size and the
    * re-identification violation flag — the pre-release privacy gate.
    * One map-side-combinable rollup, bounded by class count. */
  private def qKAnon(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.kAnonymity(
      Tables.customer(s, dir).select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)

  /** Distinct l-diversity audit ([[graft.ops.Privacy.lDiversity]],
    * l = 8) over (nation, segment) classes with the balance band as
    * the sensitive attribute — the homogeneity-attack check
    * k-anonymity misses. */
  private def qLDiversity(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.lDiversity(
      Tables.customer(s, dir).select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 8)

  /** t-closeness audit ([[graft.ops.Privacy.tCloseness]], t = 0.15)
    * over the q_l_diversity classes with the balance band as the
    * ordered sensitive attribute — the skewness-attack check the
    * distinct-count audits miss. Exact integer EMD arithmetic, one
    * 6dp division, cross-multiplied violation flag. */
  private def qTCloseness(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.tCloseness(
      Tables.customer(s, dir).select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", tMicro = 150000L)

  /** CUPED variance reduction ([[graft.ops.Experiment.cuped]]): the
    * q_ab_test arms with the event value as metric and its 10-band
    * floor as the pre-period covariate (strongly correlated by
    * construction, so ρ² is a real reduction) — pooled θ from
    * DECIMAL-exact moments, per-arm adjusted means. */
  private def qCuped(s: SparkSession, dir: String): DataFrame =
    graft.ops.Experiment.cuped(
      Tables.events(s, dir).select(
        concat(lit("arm"), (col("user_id") % 3).cast("string")).as("variant"),
        col("value"),
        (floor(col("value") / 10) * 10).cast("double").as("pre")),
      "variant", "value", "pre")

  /** Two-sample Kolmogorov–Smirnov ([[graft.ops.Stats.ksTest]],
    * α = 0.05) between the view- and purchase-event value
    * distributions — max |F₁−F₂| and the reject decision in exact
    * cross-multiplied integers over the bounded 2dp-value rollup. */
  private def qKsTest(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.ksTest(
      Tables.events(s, dir).select("event_type", "value"),
      "event_type", "value", "view", "purchase")

  /** Two-sample Mann–Whitney U ([[graft.ops.Stats.mannWhitney]]) on
    * the same pair — tie-averaged ranks exact in half-units,
    * tie-corrected normal z. */
  private def qMannWhitney(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.mannWhitney(
      Tables.events(s, dir).select("event_type", "value"),
      "event_type", "value", "view", "purchase")

  /** Per-source language-mix entropy ([[graft.ops.Stats.entropy]]):
    * the corpus-diversity gate (a near-zero source is templated or
    * single-language; near-1 normalized entropy is uniform). Terms
    * through the tokenDrift 12dp→decimal recipe. */
  private def qEntropy(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.entropy(
      Tables.documents(s, dir).select("source", "lang"),
      Seq("source"), "lang")

  /** Per-event-type OLS trend ([[graft.ops.Stats.linearFit]]): value
    * regressed on whole hours since 2024-01-01 (exact integer x — no
    * float enters the moments), slope/intercept/R² per type from one
    * exact-decimal moment rollup. */
  private def qLinearFit(s: SparkSession, dir: String): DataFrame = {
    // subtract-mod before the divide (the Funnel.retention recipe):
    // the multiple of p is < 2⁵³ so the double quotient is exact
    val d = col("ts_us") - 1704067200000000L
    val hour = ((d - pmod(d, lit(3600000000L))) / 3600000000L).cast("long")
    graft.ops.Stats.linearFit(
      Tables.events(s, dir).select(
        col("event_type"), hour.as("hour"), col("value")),
      Seq("event_type"), "hour", "value")
  }

  /** Chi-square independence test ([[graft.ops.Stats.chiSquared]])
    * between event type (5 values) and the user residue band
    * (4 values) — dof 12, critical value 21.026 pinned as the
    * 10⁻⁶-scaled literal. Join-free window marginals over the 5×4
    * observed cells; every χ² term an exact 6dp half-up integral
    * division, the statistic their exact sum. */
  private def qChisq(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.chiSquared(
      Tables.events(s, dir).select(
        col("event_type"),
        concat(lit("u"), pmod(col("user_id"), lit(4)).cast("string")).as("band")),
      "event_type", "band", critMicro = 21026000L)

  /** Benford first-digit audit ([[graft.ops.Stats.benford]]) of
    * lineitem extended price — the organic-magnitude fraud/QA screen.
    * Digit from the STRING form of the cent integer (no log10 float);
    * expected shares are pinned 10⁻⁶ literals; per-digit χ² terms and
    * their exact micro sum. */
  private def qBenford(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.benford(
      Tables.lineitem(s, dir).select("l_extendedprice"), "l_extendedprice")

  /** Corpus concentration ([[graft.ops.Stats.concentration]]) of
    * events across users — Gini (exact rank form), HHI, and top-10
    * mass share, each the 6dp half-up of an exact rational over one
    * per-user rollup. */
  private def qConcentration(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.concentration(
      Tables.events(s, dir).select("user_id"), "user_id", topK = 10)

  /** Seasonal-profile anomaly scoring ([[graft.ts.Seasonal.residuals]],
    * hour-of-day phases per event type, alarm at |residual| > 150):
    * every event scored against its type's own hourly profile —
    * integer-exact phase means broadcast back onto the stream, the
    * alarm an integer compare on micro residuals. */
  private def qSeasonal(s: SparkSession, dir: String): DataFrame =
    graft.ts.Seasonal.residuals(
      Tables.events(s, dir).select("event_id", "event_type", "ts_us", "value"),
      Seq("event_type"), "ts_us", "value",
      binUs = 3600000000L, phases = 24, thresholdMicro = 150000000L)
      .select("event_id", "event_type", "ts_us", "phase", "n_phase",
        "expected", "residual", "alarm")

  /** Per-user EWMA control chart ([[graft.ts.Ewma.controlChart]],
    * α = ¼, 8 taps, alarm at |dev| > 200): the truncated adjust-form
    * smoother as exact integer tap weights over cent values, deviation
    * vs the PRIOR smoothed value, integer-compare alarm. */
  private def qEwma(s: SparkSession, dir: String): DataFrame =
    graft.ts.Ewma.controlChart(
      Tables.events(s, dir).select("event_id", "user_id", "ts_us", "value"),
      Seq("user_id"), "ts_us", "event_id", "value",
      taps = 8, alphaNum = 1, alphaDen = 4, thresholdMicro = 200000000L)
      .select("event_id", "user_id", "ts_us", "n_taps", "ewma", "dev", "alarm")

  /** Per-event-type exact quantile report
    * ([[graft.ops.Stats.groupQuantiles]], P50/P90/P99): true type-1
    * quantiles from the bounded (type, 2dp value) rollup, each pick
    * an integer cross-multiply cum·den ≥ num·n — the latency-
    * dashboard shape with no sketch error and no float boundary. */
  private def qGroupQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.groupQuantiles(
      Tables.events(s, dir).select("event_type", "value"),
      "event_type", "value")

  /** Embedding-table quality gate
    * ([[graft.ops.Profile.embeddingAudit]], dim 64): NULL / wrong-
    * width / non-finite / zero-vector counts and the L2-norm profile,
    * index-order float folds so both engines walk the same double
    * chain. */
  private def qEmbedAudit(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.embeddingAudit(
      Tables.embeddings(s, dir).select("embedding"), "embedding", dim = 64)

  /** Referential-integrity audit ([[graft.ops.Profile.fkOrphans]]):
    * orders whose customer was dropped (parent filtered to
    * c_custkey % 7 ≠ 0 to synthesize dangling FKs) — one left join
    * against distinct parent keys + one singleton rollup. */
  private def qFkOrphans(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.fkOrphans(
      Tables.orders(s, dir).select("o_custkey"), "o_custkey",
      Tables.customer(s, dir).where(col("c_custkey") % 7 =!= 0).select("c_custkey"),
      "c_custkey")

  /** Population stability index ([[graft.ops.Stats.psi]], 10
    * baseline-decile bins) of purchase-event values against the
    * view-event baseline — the production drift gate. Bins in exact
    * integers on the bounded value rollup; log terms via the
    * tokenDrift 12dp-round → decimal-sum recipe; alert decided on the
    * exact decimal sum vs the 0.2 literal. */
  private def qPsi(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.psi(
      Tables.events(s, dir).select("event_type", "value"),
      "event_type", "value", "view", "purchase", nBins = 10)

  /** Wald SPRT ([[graft.ops.Experiment.sprt]], H0 rate 0.15 vs H1
    * 0.25, α = 0.05, β = 0.2) per user-residue arm — the always-valid
    * sequential decision: llr is LINEAR in the counts, so the chain
    * is conv·L1 + (n−conv)·L0 over pinned 10⁻⁶ log literals with
    * integer boundary compares. */
  private def qSprt(s: SparkSession, dir: String): DataFrame =
    graft.ops.Experiment.sprt(
      Tables.events(s, dir).select(
        concat(lit("arm"), (col("user_id") % 3).cast("string")).as("variant"),
        (col("event_type") === "purchase").cast("int").as("conv")),
      "variant", "conv", p0 = 0.15, p1 = 0.25)

  /** A/B readout ([[graft.ops.Experiment.abTest]]): users hashed into
    * three arms by residue, conversion = purchase event; per-arm
    * counts, 6dp rate, pooled two-proportion z vs arm0 and the 1.96
    * significance flag. One variant rollup + a whole-frame window on
    * the 3-row result (no singleton cross join — that plans the
    * banned BNLJ). */
  private def qAbTest(s: SparkSession, dir: String): DataFrame =
    graft.ops.Experiment.abTest(
      Tables.events(s, dir).select(
        concat(lit("arm"), (col("user_id") % 3).cast("string")).as("variant"),
        (col("event_type") === "purchase").cast("int").as("converted")),
      "variant", "converted", controlVariant = "arm0")

  /** Per-user lag-1..3 autocorrelation ([[graft.ts.Acf.acf]]) of the
    * event value series — the persistence screen before trusting a
    * per-entity monitor. One key exchange (window + same-key rollup);
    * 12dp-decimal term sums, 6dp double ratio (the token-drift
    * determinism recipe). */
  private def qAcf(s: SparkSession, dir: String): DataFrame =
    graft.ts.Acf.acf(
      Tables.events(s, dir).select("user_id", "ts_us", "value"),
      Seq("user_id"), "ts_us", "value", maxLag = 3)

  /** Time-weighted average per (user, 1h bucket) ([[graft.ts.Twap
    * .twap]], 2h staleness): step-interpolated exposure-time mean over
    * the irregular event series — the honest mean for bursty
    * telemetry. Exact decimal·micros weighting, one double division,
    * bounded bucket explode. */
  private def qTwap(s: SparkSession, dir: String): DataFrame =
    graft.ts.Twap.twap(
      Tables.events(s, dir).select("user_id", "ts_us", "value"),
      Seq("user_id"), "ts_us", "value",
      bucketUs = 3600000000L, maxHoldUs = 7200000000L)

  /** Leave-one-out target encoding
    * ([[graft.ops.Features.targetEncodeLoo]]): order priority →
    * total-price mean with each row's own label excluded — the
    * target-leak-safe mean encoding. One category rollup + join
    * back. */
  private def qTargetEncode(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features
      .targetEncodeLoo(
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority", "o_totalprice")
      .select("o_orderkey", "o_orderpriority", "n_cat", "loo_mean")

  /** CDC latest-snapshot compaction ([[graft.ops.Changelog.compact]]):
    * the events stream read as a per-user changelog — each event a
    * version stamped by its unique `ts_us`, `error` events as delete
    * tombstones. Per user the latest version wins; a winning tombstone
    * drops the user from the snapshot. ONE partial-aggregating
    * exchange (argmax-by-struct), O(keys) shuffled — not the
    * `row_number() = 1` respelling that sorts every version. */
  private def qChangelogCompact(s: SparkSession, dir: String): DataFrame =
    graft.ops.Changelog.compact(
      Tables.events(s, dir).select("user_id", "ts_us", "event_type", "value"),
      keyCols = Seq("user_id"), ordCols = Seq("ts_us"),
      opCol = "event_type", deleteOps = Set("error"))

  /** Type-2 SCD history ([[graft.ops.Changelog.scd2]]): each user's
    * `value` changes become validity intervals `[valid_from,
    * valid_to)`, NULL-open while current. One key exchange + a
    * codegen'd lead window. `ts_us` is unique per user in the fixture,
    * so no tie columns are needed. */
  private def qScd2(s: SparkSession, dir: String): DataFrame =
    graft.ops.Changelog.scd2(
      Tables.events(s, dir).select("user_id", "ts_us", "value"),
      keyCols = Seq("user_id"), tsCol = "ts_us")

  /** Exact prefix-filtered Jaccard self-join
    * ([[graft.ops.SetSim.jaccardSelfJoin]], t = 0.7) — the EXACT
    * counterpart of the MinHash/SimHash near-dup screens (no false
    * negatives). Token sets are synthesized from `doc_id`: class
    * `doc_id % 97` supplies 12 base tokens, with the member at index
    * `doc_id % 12` swapped for a per-index variant — same-class pairs
    * land at J = 10/14 ≈ 0.714 (above t via the INTEGER cross-multiply
    * 10·10 ≥ 7·14; a float reading of 0.7 would wobble), cross-class
    * pairs share nothing. The oracle re-derives the same pairs through
    * the naive token equi-join — a genuinely different algorithm, so
    * the prefix filter's completeness is what's being checked. */
  private def qSetsimJoin(s: SparkSession, dir: String): DataFrame = {
    val c = col("doc_id") % 97
    val toks = transform(
      sequence(lit(0L), lit(11L)),
      j => concat(lit("s"),
        when(j === col("doc_id") % 12, c * 100 + 50 + j)
          .otherwise(c * 100 + j).cast("string")))
    graft.ops.SetSim.jaccardSelfJoin(
      Tables.documents(s, dir).select(col("doc_id"), toks.as("toks")),
      "doc_id", "toks", threshold = 0.7)
  }

  /** Time-bucket OHLC resample ([[graft.ops.Resample.ohlc]], 10-minute
    * buckets per user): open/close ride partial-merge-safe
    * `min_by`/`max_by` on the unique `ts_us` — ONE map-side-combinable
    * exchange, no window sort. The 6dp mean is the integer-exact
    * Profile recipe (sign-aware half-up integral division of the
    * micro-scaled decimal sum). */
  private def qResample(s: SparkSession, dir: String): DataFrame = {
    val r = graft.ops.Resample.ohlc(
      Tables.events(s, dir).select("user_id", "ts_us", "value"),
      Seq("user_id"), "ts_us", "value", bucketUs = 600000000L)
    // 2dp DECIMAL columns are double-exact; the output contract bans
    // raw decimals (the driver's hasher renders them per-engine).
    Seq("open", "close", "high", "low", "vsum").foldLeft(r) { (d, c) =>
      d.withColumn(c, col(c).cast("double"))
    }
  }

  /** Co-citation similarity ([[graft.ops.Graph.coCitation]],
    * minCommon = 2): related targets by shared citing sources. Each
    * doc (source `p<doc_id>`) cites three residue-derived domains —
    * all sources in a residue class cite the same triple, so
    * same-class pairs accumulate class-sized `n_common` and the
    * capped gather / pair rollup / in-degree join all exercise real
    * multiplicity. The oracle re-derives the pairs through the naive
    * source self-join — a different algorithm, checking the gather +
    * posexplode pipeline end to end. */
  private def qCocitation(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val src = concat(lit("p"), col("doc_id").cast("string"))
    def dst(e: Column) = concat(lit("d"), e.cast("string"))
    val edges = d.select(src.as("src"), dst(col("doc_id") % 40).as("dst"))
      .unionAll(d.select(src.as("src"), dst((col("doc_id") + 3) % 40).as("dst")))
      .unionAll(d.select(src.as("src"), dst((col("doc_id") * 2) % 40).as("dst")))
    Graph.coCitation(edges, "src", "dst", minCommon = 2)
  }

  /** Synthesized 3-rater annotation table over the embeddings labels:
    * rater r1 is faithful, r2 flips to the next label on vec_id % 5,
    * r3 abstains (NULL) on vec_id % 7 — so majorities, ties (both
    * residues at once), and dropped votes all occur. */
  private def annotationsFixture(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val l = concat(lit("l"), col("label").cast("string"))
    val lFlip = concat(lit("l"), ((col("label") + 1) % 10).cast("string"))
    e.select(col("vec_id").as("item"), lit("r1").as("rater"), l.as("label"))
      .unionAll(e.select(col("vec_id").as("item"), lit("r2").as("rater"),
        when(col("vec_id") % 5 === 0, lFlip).otherwise(l).as("label")))
      .unionAll(e.select(col("vec_id").as("item"), lit("r3").as("rater"),
        when(col("vec_id") % 7 === 0, lit(null).cast("string")).otherwise(l).as("label")))
  }

  /** Majority-vote label resolution ([[graft.ops.Labels.majorityVote]])
    * over the 3-rater fixture: modal label per item, ties broken
    * bytewise (vec_id divisible by both 5 and 7 produces a genuine
    * 1-1 tie), integer-exact 6dp agreement. The oracle respells the
    * argmax as a row_number window — a different algorithm over the
    * same vote counts. */
  private def qMajorityVote(s: SparkSession, dir: String): DataFrame =
    graft.ops.Labels.majorityVote(
      annotationsFixture(s, dir), "item", "rater", "label")

  /** Krippendorff's alpha ([[graft.ops.Labels.krippendorffAlpha]])
    * over the same ragged 3-rater fixture — the missing-data
    * agreement coefficient (r3's abstentions make the units m = 2 or
    * m = 3, exercising the lcm-scaled 1/(m−1) coincidence weights);
    * Do, De, and alpha each one exact rational → 6dp. */
  private def qKrippendorff(s: SparkSession, dir: String): DataFrame =
    graft.ops.Labels.krippendorffAlpha(
      annotationsFixture(s, dir), "item", "rater", "label")

  /** Cohen's kappa ([[graft.ops.Labels.cohenKappa]]) between the
    * faithful rater and the 20%-flipping rater — one row of exact
    * integers (n, n_agree, Σ marginal products) plus the 6dp kappa in
    * the denominator-cleared form `(n·agree − Σ)/(n² − Σ)`. */
  private def qKappa(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val pairs = e.select(
      concat(lit("l"), col("label").cast("string")).as("a"),
      when(col("vec_id") % 5 === 0,
        concat(lit("l"), ((col("label") + 1) % 10).cast("string")))
        .otherwise(concat(lit("l"), col("label").cast("string"))).as("b"))
    graft.ops.Labels.cohenKappa(pairs, "a", "b")
  }

  /** Scored-classifier fixture: score = (vec_id % 101)/100 as exact
    * 4dp DECIMAL (hits both edges incl. the 1.0 clamp), label = 1 on
    * vec_id % 3. */
  private def scoredFixture(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      ((col("vec_id") % 101).cast("decimal(9,4)") / 100).as("score"),
      when(col("vec_id") % 3 === 0, 1).otherwise(0).as("label"))

  /** Isotonic (PAV) calibration fit
    * ([[graft.ops.Calibration.isotonicFit]]) over the scored fixture:
    * the monotone step function of pooled positive rates, trained
    * driver-side on the bounded distinct-score rollup in exact
    * integers (the trained-artifact recipe); output = the fitted
    * table, oracle = independent per-score recount joined to the
    * recorded steps. */
  private def qIsotonic(s: SparkSession, dir: String): DataFrame = {
    val fit = graft.ops.Calibration.isotonicFit(scoredFixture(s, dir), "score", "label")
    isotonicOracleArtifacts = Some(fit)
    graft.ops.Calibration.isotonicTable(s, fit)
  }

  @volatile private var isotonicOracleArtifacts
      : Option[Seq[graft.ops.Calibration.IsoStep]] = None

  /** Isotonic calibration SERVE ([[graft.ops.Calibration
    * .isotonicScore]]): the fitted step table broadcast-joined back
    * onto the scored corpus on the exact micro score key — the
    * deployment half of the q_isotonic lane (and the batch form of
    * [[graft.streaming.Streaming.isotonicScoreStream]]). Output
    * rolled up per calibrated step value: how many distinct score
    * buckets pooled into it, rows served, positives. */
  private def qIsotonicScore(s: SparkSession, dir: String): DataFrame = {
    val fit = graft.ops.Calibration.isotonicFit(scoredFixture(s, dir), "score", "label")
    isotonicScoreOracleArtifacts = Some(fit)
    graft.ops.Calibration.isotonicScore(scoredFixture(s, dir), "score", fit)
      .groupBy(col("calibrated"))
      .agg(
        count_distinct(col("score")).as("n_scores"),
        count(lit(1)).as("n_rows"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_pos"))
      .select(col("calibrated"), col("n_scores"), col("n_rows"), col("n_pos"))
  }

  @volatile private var isotonicScoreOracleArtifacts
      : Option[Seq[graft.ops.Calibration.IsoStep]] = None

  /** q_isotonic_score oracle: the serve join replayed — scored
    * fixture re-derived from raw embeddings, fitted steps as the
    * recorded VALUES literal (the constant-folded artifact recipe),
    * rollup per calibrated value. */
  private def isotonicScoreOracleSql(fit: Seq[graft.ops.Calibration.IsoStep]): String = {
    val vals = fit.map(st => s"(${st.scoreMicro}, ${st.calMicro})").mkString(", ")
    s"""WITH sc AS (SELECT
       |    CAST(CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) * 1000000
       |      AS BIGINT) AS sm,
       |    CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM embeddings),
       |f AS (SELECT * FROM (VALUES $vals) AS t(sm, cal))
       |SELECT CAST(cal AS DOUBLE) / 1000000.0 AS calibrated,
       |  CAST(COUNT(DISTINCT sc.sm) AS BIGINT) AS n_scores,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(label) AS BIGINT) AS n_pos
       |FROM sc JOIN f ON sc.sm = f.sm GROUP BY cal""".stripMargin
  }

  /** q_isotonic oracle: n / n_pos re-derived from raw embeddings; the
    * fitted calibrated value joined from the recorded steps as a
    * VALUES literal (the constant-folded artifact recipe). */
  private def isotonicOracleSql(fit: Seq[graft.ops.Calibration.IsoStep]): String = {
    val vals = fit.map(st => s"(${st.scoreMicro}, ${st.calMicro})").mkString(", ")
    s"""WITH sc AS (SELECT
       |    CAST(CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) * 1000000
       |      AS BIGINT) AS sm,
       |    CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM embeddings),
       |r AS (SELECT sm, COUNT(*) AS n, SUM(label) AS n_pos FROM sc GROUP BY sm),
       |f AS (SELECT * FROM (VALUES $vals) AS t(sm, cal))
       |SELECT CAST(r.sm AS DOUBLE) / 1000000.0 AS score, CAST(n AS BIGINT) AS n,
       |  CAST(n_pos AS BIGINT) AS n_pos, CAST(cal AS DOUBLE) / 1000000.0 AS calibrated
       |FROM r JOIN f ON r.sm = f.sm""".stripMargin
  }

  /** Reliability-diagram bins ([[graft.ops.Calibration.reliabilityBins]],
    * 10 bins): per-bin count / positives / exact score mass — integers
    * and decimals only, accuracy and confidence are one division away. */
  private def qReliability(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.reliabilityBins(scoredFixture(s, dir), "score", "label", nBins = 10)
      // 4dp DECIMAL mass cast per the no-raw-decimal output contract:
      // both engines convert the identical exact rational to the same
      // nearest double.
      .withColumn("score_sum", col("score_sum").cast("double"))

  /** Clustering external validation
    * ([[graft.ops.Eval.clusteringAgreement]]): the residue-flip
    * grouping vs gold labels — purity and the pair-counting Adjusted
    * Rand Index, both exact rationals (ARI in the doubled cleared
    * form, sign-aware 6dp). */
  private def qAri(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.clusteringAgreement(
      Tables.embeddings(s, dir).select(
        concat(lit("c"),
          when(col("vec_id") % 5 === 0, (col("label") + 1) % 10)
            .otherwise(col("label")).cast("string")).as("cluster"),
        concat(lit("l"), col("label").cast("string")).as("gold")),
      "cluster", "gold")

  /** Per-class classifier scorecard ([[graft.ops.Eval.classReport]])
    * over the 10-class embeddings labels with the residue-flip
    * predictor (vec_id % 5 flips to the next class): confusion-derived
    * tp/fp/fn per class with 6dp precision / recall / cleared-form F1.
    * One bounded (label, pred) rollup; marginals ride that frame. */
  private def qClassReport(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.classReport(
      Tables.embeddings(s, dir).select(
        concat(lit("l"), col("label").cast("string")).as("gold"),
        concat(lit("l"),
          when(col("vec_id") % 5 === 0, (col("label") + 1) % 10)
            .otherwise(col("label")).cast("string")).as("pred")),
      "gold", "pred")

  /** Operating-point selection ([[graft.ops.Thresholds
    * .precisionThreshold]], target 0.80): the lowest score cutoff
    * whose kept set reaches 80% precision — max recall at the target.
    * Labels here CORRELATE with score plus residue noise, so the
    * precision curve actually bends; the membership test is
    * cross-multiplied integers (no float boundary). */
  private def qThreshold(s: SparkSession, dir: String): DataFrame =
    graft.ops.Thresholds.precisionThreshold(
      Tables.embeddings(s, dir).select(
        ((col("vec_id") % 101).cast("decimal(9,4)") / 100).as("score"),
        ((col("vec_id") % 101) + (col("vec_id") % 7) * 10 >= 80).cast("int").as("label")),
      "score", "label", targetPrecisionMicro = 800000L)

  /** Expected calibration error ([[graft.ops.Calibration.ece]], 10
    * bins): the telescoped `Σ|n_pos − score_sum| / n` form, DECIMAL-
    * exact with one final 6dp half-up. */
  private def qEce(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.ece(scoredFixture(s, dir), "score", "label", nBins = 10)

  /** Split-conformal calibration ([[graft.ops.Calibration.conformal]],
    * α = 0.1): q̂ from the even-vec calibration half (exact order
    * statistic over the bounded 4dp-value rollup — never a corpus
    * sort), coverage + mean set size on the odd-vec test half. The
    * ≥ 90 % marginal-coverage guarantee is the assertable contract. */
  private def qConformal(s: SparkSession, dir: String): DataFrame = {
    val sc = Tables.embeddings(s, dir).select(
      col("vec_id"),
      ((col("vec_id") % 101).cast("decimal(9,4)") / 100).as("score"),
      when(col("vec_id") % 3 === 0, 1).otherwise(0).as("label"))
    graft.ops.Calibration.conformal(
      sc.where(col("vec_id") % 2 === 0),
      sc.where(col("vec_id") % 2 === 1),
      "score", "label", new java.math.BigDecimal("0.1000"))
  }

  /** Session Markov transition matrix ([[graft.ops.Markov
    * .transitions]]): event-type → next-event-type counts and 6dp row
    * probabilities, transitions cut at the q_user_sessions 6 h gap —
    * the lead pairs ride ONE user exchange, the rollup is bounded by
    * the state-pair vocabulary. */
  private def qMarkov(s: SparkSession, dir: String): DataFrame =
    graft.ops.Markov.transitions(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "event_type"),
      keyCols = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
      stateCol = "event_type", gapUs = UserGapUs)

  /** Keyed cross-correlogram ([[graft.ts.Xcorr.correlogram]],
    * maxLag 3) between the parity-split channels of each user's
    * ordered value stream: every lag is a `lead(value, 2l+1)` over
    * ONE key-ordered window (no self-join), sums are exact 4dp
    * decimals, rank ties break on lag. */
  private def qXcorr(s: SparkSession, dir: String): DataFrame =
    graft.ts.Xcorr.correlogram(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
      valueCol = "value", maxLag = 3)

  /** Hysteresis burst detection ([[graft.ts.Burst.detect]]): per-user
    * events entering above μ+2σ, extending above μ+1σ, merging gaps
    * < 3 samples, dropping spans < 2 — the ripple-detector recipe on
    * the event value stream, μ/σ DECIMAL-exact so both engines walk
    * identical thresholds. */
  private def qRipples(s: SparkSession, dir: String): DataFrame =
    graft.ts.Burst.detect(
      Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value"),
      keyCols = Seq("user_id"), tsCol = "ts_us", tieCol = "event_id",
      valueCol = "value",
      kHi = 2.0, kLo = 1.0, mergeGapSamples = 3L, minSamples = 2L)

  /** Per-language parity audit of the gopher gate ([[graft.ops
    * .Fairness.parityReport]]): selection rate, gap vs overall, and
    * the four-fifths disparate-impact ratio per lang — ONE scan (the
    * gate keeps `lang` through), one bounded group rollup. */
  private def qFairness(s: SparkSession, dir: String): DataFrame =
    graft.ops.Fairness.parityReport(
      Text.gopherFilter(
        Tables.documents(s, dir),
        minTokens = 20, maxTokens = 80,
        minMwl = 4.0, maxMwl = 10.0,
        minStopRatio = 0.02, minTtr = 0.35,
        keepCols = Seq("lang")),
      "lang", "passes")

  /** Per-rater accuracy vs the majority label
    * ([[graft.ops.Labels.raterAccuracy]]) over the 3-rater fixture:
    * r1 ≈ 1.0 (faithful), r2 loses the vec_id % 5 flips, r3 only
    * annotates the non-abstained items. One join + one rollup past
    * the vote resolution. */
  private def qRaterAccuracy(s: SparkSession, dir: String): DataFrame =
    graft.ops.Labels.raterAccuracy(
      annotationsFixture(s, dir), "item", "rater", "label")

  /** Per-document tf·idf keywords ([[graft.ops.Text.keywordsTfIdf]],
    * k = 5) over the REAL document text: one lineage-cut (doc, token)
    * rollup feeding both the df rollup and the score join, 4dp-rounded
    * scores ranked with bytewise tie-break. */
  private def qKeywords(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.keywordsTfIdf(
      Tables.documents(s, dir).select("doc_id", "text"), k = 5)

  /** Token-distribution drift ([[graft.ops.Text.tokenDrift]]): JS
    * divergence between the even-doc corpus and the odd-doc corpus
    * with a planted token burst (every third odd doc gains two
    * `driftterm` occurrences) — the burst is mass the before side has
    * NEVER seen, exercising the one-sided term branches. Per-term
    * doubles follow the identical operation order on both engines;
    * the sum is 12dp-decimal (partition-order-free). */
  private def qTokenDrift(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val before = d.where(col("doc_id") % 2 === 0).select("text")
    val after = d.where(col("doc_id") % 2 === 1).select(
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" driftterm driftterm")))
        .otherwise(col("text")).as("text"))
    graft.ops.Text.tokenDrift(before, after)
  }

  /** Snapshot row-diff ([[graft.ops.Changelog.snapshotDiff]]): two
    * builds of the orders table — keys divisible by 10 exist only in
    * "old" (removed), by 7 only in "new" (added), by 5 get a price
    * bump (changed) — classified per key through ONE full-outer
    * equi-join with null-safe payload comparison. */
  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val price = col("o_totalprice").cast("decimal(18,2)")
    val old = o.where(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"), price.as("price"), col("o_orderstatus").as("status"))
    val neu = o.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        (price + when(col("o_orderkey") % 5 === 0, 1).otherwise(0)).as("price"),
        col("o_orderstatus").as("status"))
    graft.ops.Changelog.snapshotDiff(old, neu, Seq("o_orderkey"))
      // Diff classification runs on exact DECIMAL; the 2dp outputs cast
      // to double per the no-raw-decimal output contract.
      .withColumn("old_price", col("old_price").cast("double"))
      .withColumn("new_price", col("new_price").cast("double"))
  }

  /** Interval×interval overlap join
    * ([[graft.ts.IntervalJoin.overlapJoin]], keyed by user): 4-hour
    * purchase windows against 8-hour signup windows — every
    * overlapping pair with its intersection, emitted exactly once via
    * the bucket-of-max-start rule (no distinct). The oracle is the
    * naive range join. */
  private def qOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val a = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("event_id").as("a_id"),
      col("ts_us").as("a_start"), (col("ts_us") + 14400000000L).as("a_stop"))
    val b = ev.where(col("event_type") === "signup").select(
      col("user_id"), col("event_id").as("b_id"),
      col("ts_us").as("b_start"), (col("ts_us") + 28800000000L).as("b_stop"))
    graft.ts.IntervalJoin
      .overlapJoin(a, b, "a_start", "a_stop", "b_start", "b_stop",
        bucketWidth = 14400000000L, keyCols = Seq("user_id"))
      .select("user_id", "a_id", "b_id", "overlap_start", "overlap_stop")
  }

  /** Equal-frequency quartile binning
    * ([[graft.ops.Features.quantileBin]], nBins = 4) of the lineitem
    * price: cuts from the deterministic histogram-quantile estimator
    * (two bounded passes), assignment a stateless projection. The
    * oracle recomputes the SAME cuts through the q_quantiles SQL
    * respelling and counts cuts ≤ value per row. */
  private def qQuantileBin(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features
      .quantileBin(
        Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast("double").as("value")),
        "value", nBins = 4)
      .select("l_orderkey", "l_linenumber", "value", "bin")

  /** Split-leakage check ([[graft.ops.Mixture.splitLeakCheck]]): a
    * deliberately WRONG row-wise split (hash of doc_id) checked
    * against source groups — every multi-doc source leaks across
    * splits and must be reported with its majority-split count; a
    * correct group-keyed split ([[graft.ops.Mixture.splitAssign]] on
    * the group) returns empty, which SparkEntrySpec pins. */
  private def qSplitLeak(s: SparkSession, dir: String): DataFrame = {
    val rowWise = graft.ops.Mixture.splitAssign(
      Tables.documents(s, dir).select("doc_id", "source"),
      Seq("train" -> 0.8, "test" -> 0.2), salt = "leak1")
    graft.ops.Mixture.splitLeakCheck(rowWise, "source", "split")
  }

  /** Politeness frontier schedule
    * ([[graft.ops.Urls.politenessSchedule]], 5 s crawl delay): every
    * URL gets a deterministic fetch slot — per-host sequence in URL
    * order plus an md5-derived host offset that de-synchronizes
    * hosts. The oracle replays the row_number and the exact md5
    * offset arithmetic. */
  private def qCrawlSchedule(s: SparkSession, dir: String): DataFrame = {
    val host = concat(lit("site"), (col("doc_id") % 20).cast("string"), lit(".com"))
    val url = concat(lit("http://"), host, lit("/p"), col("doc_id").cast("string"))
    graft.ops.Urls.politenessSchedule(
      Tables.documents(s, dir).select(url.as("url"), host.as("host")),
      "url", "host", delayUs = 5000000L)
  }

  /** Water-filling budget allocation ([[graft.ops.Mixture.waterFill]],
    * budget 2000 over ~4950 total demand): 97 keys with quadratic-
    * residue demands — small demands funded whole, heavy ones capped
    * at the exact integer level τ with Σ min(demand, τ) ≤ budget. The
    * oracle solves τ independently through the histogram-prefix
    * closed form in SQL. */
  private def qWaterFill(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.documents(s, dir).select((col("doc_id") % 97).as("k")).distinct()
    val sized = keys.select(col("k"), (col("k") * col("k") % 101 + 1).as("demand"))
    graft.ops.Mixture.waterFill(sized, "k", "demand", budget = 2000L)
  }

  /** Encoding-artifact screen ([[graft.ops.Text.encodingArtifacts]]) —
    * the ftfy-class mojibake/replacement-char gate. The ASCII corpus
    * gets one injected suffix per doc_id residue: a Latin-1
    * double-decode ("CafÃ©"), a cp1252 one
    * ("donâ€™t"), a U+FFFD-damaged byte, and a CLEAN
    * accented word ("não") that must NOT flag. The oracle states
    * each residue's counts literally — the regex never runs
    * oracle-side. */
  private def qMojibake(s: SparkSession, dir: String): DataFrame = {
    val r = col("doc_id") % 4
    val injected = when(r === 0, concat(col("text"), lit(" CafÃ©")))
      .when(r === 1, concat(col("text"), lit(" donâ€™t")))
      .when(r === 2, concat(col("text"), lit(" bad�byte")))
      .otherwise(concat(col("text"), lit(" não clean")))
    graft.ops.Text.encodingArtifacts(
      Tables.documents(s, dir).select(col("doc_id"), injected.as("text")))
  }

  /** k-core ([[graft.ops.Graph.kCore]], k = 2) over a synthesized
    * 25-group triangle-plus-pendant-chain graph (doc_id % 25 picks the
    * group, doc_id % 6 the edge template — 25 coprime to 6, so every
    * group gets all six edges at any scale): the chain p3—p2—p1 must
    * CASCADE off one link per peel round before each triangle core
    * stabilizes — exercising the iteration, not just the degree
    * filter. The oracle unrolls the full 8 rounds unconditionally
    * (peeling is monotone, so the operator's fixpoint early-stop is
    * invisible). */
  private def qKCore(s: SparkSession, dir: String): DataFrame = {
    val g = concat(lit("g"), (col("doc_id") % 25).cast("string"))
    val r = col("doc_id") % 6
    val srcSuf = when(r === 0, ":t1").when(r === 1, ":t2").when(r === 2, ":t1")
      .when(r === 3, ":t3").when(r === 4, ":p1").otherwise(":p2")
    val dstSuf = when(r === 0, ":t2").when(r === 1, ":t3").when(r === 2, ":t3")
      .when(r === 3, ":p1").when(r === 4, ":p2").otherwise(":p3")
    val edges = Tables.documents(s, dir).select(
      concat(g, srcSuf).as("src"), concat(g, dstSuf).as("dst"))
    Graph.kCore(edges, k = 2, maxRounds = 8)
  }

  /** Triangle counts + local clustering coefficient
    * ([[graft.ops.Graph.triangleCounts]]) over the q_link_graph domain
    * edges — the link-farm density signal next to authority. The ring
    * sites close exactly 2 triangles each through the `example.org`
    * hub; the hub sits in all 20; the oracle replays the same
    * degree-ordered wedge enumeration literally. */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val edges = qLinkGraph(s, dir).select(
      col("src_domain").as("src"),
      col("dst_domain").as("dst"))
    Graph.triangleCounts(edges)
  }

  /** Winsorized price feature ([[graft.ops.Features.winsorize]],
    * p05/p95 over the FULL lineitem scan; output subset by residue so
    * the gate stays bounded): the heavy-tail clamp before a feature
    * feeds a mean-sensitive consumer. Cuts from the deterministic
    * histogram-quantile estimator; clamp is a stateless projection. */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features
      .winsorize(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice", pLo = 0.05, pHi = 0.95)
      .where(col("l_orderkey") % 997 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("price"),
        col("l_extendedprice_w").as("price_w"))

  /** Pairwise co-occurrence ([[graft.ops.Itemsets.coOccurrence]],
    * support ≥ 5): part families co-purchased within an order — the
    * A-Priori first pass. The quadratic step is bounded per basket
    * (orders hold ≤ 7 lineitems, cap 20); the pair rollup is
    * map-side-combinable and the output bounded by the 200-family
    * universe. */
  private def qItemPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Itemsets.coOccurrence(
      Tables.lineitem(s, dir).select(
        col("l_orderkey").as("basket"),
        concat(lit("p"), (col("l_partkey") % 200).cast("string")).as("item")),
      "basket", "item", minSupport = 5L, maxBasketSize = 20)

  /** Association rules ([[graft.ops.Itemsets.rules]], support ≥ 5 on
    * the same basket fixture): directed confidences and lift per
    * qualifying pair, supports measured over the identical basket
    * universe, every ratio an exact 6dp half-up. The oracle re-derives
    * the pairs through the naive self-join — a different algorithm. */
  private def qRules(s: SparkSession, dir: String): DataFrame =
    graft.ops.Itemsets.rules(
      Tables.lineitem(s, dir).select(
        col("l_orderkey").as("basket"),
        concat(lit("p"), (col("l_partkey") % 200).cast("string")).as("item")),
      "basket", "item", minSupport = 5L, maxBasketSize = 20)

  /** Jaro-Winkler record linkage ([[graft.functions.JaroWinkler]],
    * jw ≥ 0.85 at 6dp) over the SNM key fixture: per base number, the
    * exact / last-digit-typo / suffixed variants pair within their
    * base through one equi-join — the OTHER standard linkage scorer
    * next to q_snm_dedup's levenshtein, as a native codegen kernel.
    * The oracle replays DuckDB's own `jaro_winkler_similarity` (the
    * kernel is golden-pinned bit-for-bit against it, degenerate
    * corners included). */
  private def qJaroLink(s: SparkSession, dir: String): DataFrame = {
    val b = lpad((col("doc_id") % 100).cast("string"), 4, "0")
    val key = when(col("doc_id") % 3 === 0, concat(lit("rec "), b))
      .when(col("doc_id") % 3 === 1, concat(lit("rec "), substring(b, 1, 3), lit("x")))
      .otherwise(concat(lit("rec "), b, lit("z")))
    val keys = Tables.documents(s, dir)
      .select((col("doc_id") % 100).as("base"), key.as("key"))
      .distinct()
    keys.toDF("base", "key_a")
      .join(keys.toDF("base", "key_b"), "base")
      .where(col("key_a") < col("key_b"))
      .select(
        col("key_a"), col("key_b"),
        round(graft.functions.JaroWinkler.jaroWinkler(col("key_a"), col("key_b")), 6)
          .as("jw"))
      .where(col("jw") >= 0.85)
  }

  /** Zipf-law fit ([[graft.ops.Text.zipfFit]], top 1000 ranks): OLS of
    * ln(freq) on ln(rank) — natural text reads slope ≈ −1; the
    * corpus-health diagnostic next to q_corpus_stats. The regression
    * frame is bounded by topN regardless of corpus size. */
  private def qZipf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.zipfFit(Tables.documents(s, dir).select("text"), topN = 1000)

  /** Small-file compaction plan ([[graft.ops.Compaction.planGroups]],
    * 16 MB target): the OPTIMIZE-style rewrite grouping over a
    * synthesized file listing (pseudo-random sizes off doc_id) —
    * sequential fill over the (bytes DESC, name) total order, the
    * deterministic policy an independent engine replays as one window
    * scan. The listing frame is one row per FILE, so the total-order
    * window is tiny by construction. */
  private def qCompactionPlan(s: SparkSession, dir: String): DataFrame =
    graft.ops.Compaction.planGroups(
      Tables.documents(s, dir).select(
        concat(lit("part-"), lpad(col("doc_id").cast("string"), 8, "0"),
          lit(".parquet")).as("file"),
        (pmod(col("doc_id") * 2654435761L, lit(10000000L)) + 1000L).as("bytes")),
      "file", "bytes", targetBytes = 16000000L)

  /** Personalized PageRank ([[graft.ops.Graph.pagerank]] with
    * `restartNodes`, 5 iterations): TrustRank-style authority seeded
    * at `example.org` + `site0.com` — restart AND dangling mass land
    * on the seeds, rank₀ = the seed distribution, so scores read as
    * "visit probability of a surfer who teleports home", the crawl
    * prior for seed-anchored frontier expansion. Same loop plan as
    * classic PageRank (the `__s` column rides the node frame). */
  private def qPpr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = qLinkGraph(s, dir).select(
      col("src_domain").as("src"),
      col("dst_domain").as("dst"),
      col("n_links").cast("double").as("w"))
    val seeds = Seq("example.org", "site0.com").toDF("node")
    Graph
      .pagerank(edges, iterations = 5, damping = 0.85, weightCol = Some("w"),
        restartNodes = Some(seeds), assumeCollapsed = true)
      .select(col("node"), round(col("rank"), 6).as("pr"))
  }

  /** Multi-source BFS hop distances ([[graft.ops.Graph.bfsDistances]],
    * 6 hops): link distance from a trusted seed set — crawl frontier
    * depth / contamination blast radius. The fixture is a fixed
    * 500-node functional graph over doc_id residues (a → 2a+1 and
    * a → a+7 mod 500, seeds 0 and 250), so every scale derives the
    * SAME graph and the level-synchronous loop runs its full 6 rounds.
    * The oracle is a recursive CTE enumerating all walks ≤ 6 and
    * taking MIN — a different algorithm validating the frontier
    * expansion end to end. */
  private def qBfsHops(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val a = col("doc_id") % 500
    val edges = d.select(a.as("src"), ((a * 2) + 1) % 500 as "dst")
      .unionAll(d.select(a.as("src"), (a + 7) % 500 as "dst"))
    val sources = d.select(a.as("node")).where(a === 0 || a === 250)
    Graph.bfsDistances(edges, sources, maxHops = 6)
  }

  /** Content-defined chunking ([[graft.functions.CdcChunks]], w = 2,
    * modulus 16): token-granular Rabin/FastCDC cuts — boundaries
    * depend on local content, so an edit shifts only its own chunk,
    * not every downstream one (the fixed-size q_chunk_docs failure
    * mode). Stateless kernel explode, zero shuffle; the oracle
    * recomputes every cut (gram poly-hash → cumulative boundary count
    * → string_agg) in DuckDB. */
  private def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      posexplode(graft.functions.CdcChunks.cdcChunks(col("text"), 2, 16))
        .as(Seq("chunk_idx", "chunk")))

  /** Chunk-level dedup over the CDC chunks: per document, how many of
    * its chunks also occur in ANOTHER document — the shift-robust
    * shared-boilerplate measure (doc-level hashes miss it, fixed-size
    * chunks lose it after one insertion). Same plan family as
    * [[qDupSpans]]: one chunk-frequency exchange + semi-join, per-doc
    * totals from the kernel array (no second aggregate consumer). */
  private def qCdcDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"),
      graft.functions.CdcChunks.cdcChunks(col("text"), 2, 16).as("__chs"))
    val chunks = docs.select(col("doc_id"), explode(col("__chs")).as("chunk"))
    val dup = chunks
      .groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") > 1)
    val dupPerDoc = chunks
      .join(dup.select("chunk"), Seq("chunk"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_chunks"))
    docs
      .select(col("doc_id"), size(col("__chs")).cast("long").as("n_chunks"))
      .join(dupPerDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        round(coalesce(col("n_dup_chunks"), lit(0L)).cast("double") / col("n_chunks"), 4)
          .as("dup_frac"))
  }

  /** Per-source distinct 3-gram cardinality via the KMV sketch
    * ([[graft.ops.Cardinality.kmvDistinct]], k = 64): O(k) state per
    * group at any corpus size — the telemetry primitive that replaces
    * an exact countDistinct shuffle of the gram universe. The
    * deterministic 60-bit hash makes the whole estimate hash-exact
    * oracle-checkable (`ORDER BY hash LIMIT k` is the same sketch in
    * SQL) — the reproducibility HLL can't give. */
  private def qDistinctSketch(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir).select(
      col("source"),
      explode(graft.functions.ShingleArray.shingleArray(col("text"), 3)).as("gram"))
    graft.ops.Cardinality.kmvDistinct(grams, "source", "gram", k = 64)
  }

  /** Domain-level crawl graph ([[graft.ops.Urls.domainEdges]]) over a
    * synthesized page shell: each document gets a base URL on one of 20
    * `siteN.com` hosts and an anchor set exercising every href
    * resolution shape — absolute, protocol-relative (`//host`),
    * root-relative (`/path`), query-relative (`?x=1`), path-relative
    * (`sub/p.html`), plus a
    * fragment-only and a `mailto:` link that must DROP — and a hub
    * link on every page. The oracle never runs extraction or
    * resolution: it states each residue's expected edge LITERALLY from
    * the same doc_id arithmetic. */
  private def qLinkGraph(s: SparkSession, dir: String): DataFrame = {
    val host = concat(lit("site"), (col("doc_id") % 20).cast("string"), lit(".com"))
    val dst = concat(lit("site"), ((col("doc_id") + 1) % 20).cast("string"), lit(".com"))
    val baseUrl = concat(
      lit("http://"), host, lit("/a/b/page"), (col("doc_id") % 10).cast("string"), lit(".html"))
    val varying = when(
      col("doc_id") % 5 === 0,
      concat(lit("<a href=\"http://"), dst, lit("/p1\">x</a>")))
      .when(col("doc_id") % 5 === 1, concat(lit("<a href=\"//"), dst, lit("/p2\">x</a>")))
      .when(
        col("doc_id") % 5 === 2,
        lit("<a href=\"/local/p3\">x</a><a href=\"?x=1\">q</a>"))
      .when(col("doc_id") % 5 === 3, lit("<a HREF='sub/p4.html'>x</a>"))
      .otherwise(lit("<a href=\"#top\">x</a><a href=\"mailto:a@b.c\">m</a>"))
    val html = concat(
      lit("<html><body>"), varying,
      lit("<a href=\"https://hub.example.org/h\">hub</a></body></html>"))
    graft.ops.Urls.domainEdges(
      Tables.documents(s, dir).select(col("doc_id"), baseUrl.as("base_url"), html.as("html")),
      "html", "base_url")
  }

  /** WARC ingestion ([[graft.ops.Warc.responses]] over the
    * length-driven [[graft.functions.WarcRecords]] kernel): each
    * document synthesizes a 2-record WARC blob — a warcinfo record
    * (must be filtered out) plus an HTTP response whose body by
    * doc_id residue exercises the adversarial shapes: residue 2
    * EMBEDS a full `WARC/1.0` record header inside the payload (a
    * split/regex parser manufactures a phantom record there; only
    * Content-Length-driven parsing survives), residue 3 carries an
    * interior `\r\n\r\n` (the HTTP body must keep it — the record
    * length bounds the payload, not a delimiter), residue 1 is a 404.
    * The oracle states every output column LITERALLY from the doc_id
    * arithmetic — extraction never runs oracle-side. */
  private def qWarcExtract(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val crlf = "\r\n"
    val uri = concat(lit("http://site"), (d % 20).cast("string"), lit(".com/p"), (d % 10).cast("string"))
    val statusLine = when(d % 4 === 1, lit("404 Not Found")).otherwise(lit("200 OK"))
    val body = when(d % 4 === 0, lit("<html>ok</html>"))
      .when(d % 4 === 1, lit("<html>notfound</html>"))
      .when(d % 4 === 2,
        lit(s"about:${crlf}WARC/1.0${crlf}WARC-Type: fake${crlf}Content-Length: 0$crlf${crlf}more"))
      .otherwise(lit(s"part1$crlf${crlf}part2"))
    val http = concat(
      lit("HTTP/1.1 "), statusLine, lit(s"${crlf}Content-Type: text/html$crlf$crlf"), body)
    val date = "2026-01-01T00:00:00Z"
    val warc = concat(
      lit(s"WARC/1.0${crlf}WARC-Type: warcinfo${crlf}WARC-Date: $date${crlf}Content-Length: 0$crlf$crlf$crlf$crlf"),
      lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf + "WARC-Target-URI: "), uri,
      lit(s"${crlf}WARC-Date: $date${crlf}WARC-Record-ID: <urn:uuid:"), d.cast("string"),
      lit(">" + crlf + "Content-Length: "), octet_length(http).cast("string"),
      lit(crlf + crlf), http, lit(crlf + crlf))
    graft.ops.Warc.responses(
      Tables.documents(s, dir).select(d, warc.as("warc")), "warc", carry = Seq("doc_id"))
  }

  /** The raw-crawl-to-graph composition: WARC blob →
    * [[graft.ops.Warc.responses]] → [[graft.ops.Urls.domainEdges]]
    * (href scan + resolve + registrable-domain rollup, all native
    * kernels) in ONE stateless plan — what a pretraining pipeline runs
    * against a crawl segment before any quality pass. Each document's
    * response body links to the successor site (absolute), to itself
    * (root-relative `/local`), and to a hub; the oracle states the
    * three edges per doc literally (the q_link_graph discipline) —
    * neither the WARC parse nor the link extraction runs oracle-side. */
  private def qWarcLinks(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val crlf = "\r\n"
    val uri = concat(lit("http://site"), (d % 20).cast("string"), lit(".com/idx.html"))
    val body = concat(
      lit("<html><a href=\"http://site"), ((d + 1) % 20).cast("string"),
      lit(".com/p\">x</a><a href=\"/local\">y</a>" +
        "<a href=\"https://hub.example.org/h\">hub</a></html>"))
    val http = concat(lit(s"HTTP/1.1 200 OK$crlf$crlf"), body)
    val warc = concat(
      lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf + "WARC-Target-URI: "), uri,
      lit(crlf + "Content-Length: "), octet_length(http).cast("string"),
      lit(crlf + crlf), http, lit(crlf + crlf))
    val resp = graft.ops.Warc.responses(
      Tables.documents(s, dir).select(d, warc.as("warc")), "warc", carry = Seq("doc_id"))
    graft.ops.Urls.domainEdges(
      resp.select(col("body").as("html"), col("target_uri").as("base")), "html", "base")
  }

  /** The record-granular `.warc.gz` source end-to-end
    * ([[graft.io.warc.WarcGzDataSourceV2]] →
    * [[graft.ops.Warc.responsesFromRecords]]): reads the deterministic
    * two-segment fixture ([[graft.io.warc.WarcGzFixture]], one gzip
    * member per record — the CommonCrawl layout) with a 2 KiB split
    * size, so byte-range splitting and boundary RESYNCHRONIZATION run
    * inside the oracle gate, plus the warcinfo-member filter. The
    * oracle states every column from the record-index arithmetic
    * (`range(50)`); gzip decode, boundary scan and WARC parse never
    * run oracle-side. */
  private def qWarcGzCrawl(s: SparkSession, dir: String): DataFrame = {
    val fixture = graft.io.warc.WarcGzFixture.ensure()
    val recs = s.read.format("warcgz")
      .option("targetsplitbytes", "2048")
      .load(fixture)
    graft.ops.Warc.responsesFromRecords(recs, carry = Seq("content_length"))
  }

  /** Chunked Transfer-Encoding decode inside the WARC lane
    * ([[graft.functions.DechunkHttp]] gated by the header block in
    * [[graft.ops.Warc.httpBody]]): residue 0 carries a well-formed
    * chunked body (two chunks, hex size computed from the doc_id
    * width), residue 1 a plain body (no TE header — must pass through
    * untouched), residue 2 DECLARES chunked but frames it malformed
    * (body must quarantine to NULL). The oracle states the decoded
    * body literally — the dechunk kernel never runs oracle-side. */
  private def qWarcDechunk(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val crlf = "\r\n"
    val part1 = concat(lit("alpha-"), d.cast("string"))
    val chunked = concat(
      lower(hex(octet_length(part1))), lit(crlf), part1,
      lit(s"${crlf}5$crlf:beta$crlf" + s"0$crlf$crlf"))
    val body = when(d % 3 === 0, chunked)
      .when(d % 3 === 1, concat(lit("plain-"), d.cast("string")))
      .otherwise(lit(s"3${crlf}oops"))
    val te = when(d % 3 === 1, lit("")).otherwise(lit(s"Transfer-Encoding: chunked$crlf"))
    val http = concat(lit("HTTP/1.1 200 OK" + crlf), te, lit(crlf), body)
    val date = "2026-01-01T00:00:00Z"
    val warc = concat(
      lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf + "WARC-Target-URI: "),
      concat(lit("http://c"), (d % 20).cast("string"), lit(".com/x")),
      lit(s"${crlf}WARC-Date: $date${crlf}WARC-Record-ID: <urn:uuid:"), d.cast("string"),
      lit(">" + crlf + "Content-Length: "), octet_length(http).cast("string"),
      lit(crlf + crlf), http, lit(crlf + crlf))
    graft.ops.Warc.responses(
      Tables.documents(s, dir).select(d, warc.as("warc")), "warc", carry = Seq("doc_id"))
  }

  /** The SFT lane feeding the corpus dedup machinery end-to-end (r17
    * verdict #6): near-duplicate dialog fixture →
    * [[graft.ops.Dialogs.flattenValid]] (invalid dialogs gated out) →
    * [[graft.ops.DedupDocs.minhashLshPairs]] over the flattened chat
    * template text. Dialogs sharing `doc_id % 200` are near-identical
    * (one verb/noun varies with `doc_id / 200`); `doc_id % 13 == 0`
    * rows are INVALID (assistant-first) and must be gated out BEFORE
    * dedup — a pair involving one would hash-mismatch the oracle. The
    * oracle restates the template text literally, then re-runs the
    * q_minhash_lsh banding chain over it. */
  private def qDialogDedup(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val g = (d % 200).cast("string")
    def turn(r: String, c: Column) = struct(lit(r).as("role"), c.as("content"))
    val user = concat(lit("how do I configure item "), g, lit(" in the build"))
    val variant = floor(d / 200) % 3
    val assistant = when(variant === 0,
        concat(lit("set option "), g, lit(" in the config file then rerun")))
      .when(variant === 1,
        concat(lit("set option "), g, lit(" in the config file then retry")))
      .otherwise(concat(lit("set flag "), g, lit(" in the config file then rerun")))
    val conv = when(d % 13 === 0, array(turn("assistant", assistant), turn("user", user)))
      .otherwise(array(turn("user", user), turn("assistant", assistant)))
    val flat = graft.ops.Dialogs.flattenValid(
      Tables.documents(s, dir).select(d, conv.as("turns")), "turns")
    DedupDocs.minhashLshPairs(
      flat.select("doc_id", "text"), k = 3, numHashes = 16, rowsPerBand = 4)
  }

  /** Conversation fixture for the [[graft.ops.Dialogs]] lane: per
    * document a turns array by doc_id residue — (0) valid 2-turn with
    * doc_id-bearing contents, (1) assistant-first (start/end defect),
    * (2) broken alternation, (3) empty assistant content, (4) valid
    * 4-turn — exercising every QA flag. */
  private def dialogFixture(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    def turn(r: String, c: Column) = struct(lit(r).as("role"), c.as("content"))
    val conv = when(d % 5 === 0, array(
        turn("user", concat(lit("hi "), d.cast("string"))),
        turn("assistant", concat(lit("re "), d.cast("string")))))
      .when(d % 5 === 1, array(turn("assistant", lit("bad start")), turn("user", lit("x"))))
      .when(d % 5 === 2, array(
        turn("user", lit("a")), turn("user", lit("b")), turn("assistant", lit("c"))))
      .when(d % 5 === 3, array(turn("user", lit("q")), turn("assistant", lit(""))))
      .otherwise(array(
        turn("user", lit("q1")), turn("assistant", lit("a1")),
        turn("user", lit("q2")), turn("assistant", lit("a2"))))
    Tables.documents(s, dir).select(d, conv.as("turns"))
  }

  /** Dialog QA ([[graft.ops.Dialogs.validateDialogs]]): per-dialog
    * flag battery. Oracle states every flag literally from the
    * residue arithmetic — the HOF chain never runs oracle-side. */
  private def qDialogQa(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dialogs.validateDialogs(dialogFixture(s, dir), "turns").drop("turns")

  /** Gate + chat-template flatten
    * ([[graft.ops.Dialogs.flattenValid]]): only the two valid
    * residues survive; the oracle rebuilds their template text
    * literally (chr(10)-joined). */
  private def qDialogFlatten(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dialogs.flattenValid(dialogFixture(s, dir), "turns")
      .select("doc_id", "n_turns", "n_user", "n_assistant", "text", "n_chars")

  /** Per-role mass rollup ([[graft.ops.Dialogs.roleStats]]) — the
    * exchange is bounded by the role vocabulary (2 here). */
  private def qDialogRoles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dialogs.roleStats(dialogFixture(s, dir), "turns")

  /** Preference-pair QA ([[graft.ops.Dialogs.validatePreferencePairs]])
    * over a residue fixture — (0) valid chosen-longer, (1) identical,
    * (2) empty chosen, (3) valid chosen-shorter. Oracle states every
    * flag and ratio literally. */
  private def qPrefQa(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val chosen = when(d % 4 === 0, lit("longer answer ok"))
      .when(d % 4 === 1, lit("same")).when(d % 4 === 2, lit("")).otherwise(lit("ab"))
    val rejected = when(d % 4 === 0, lit("short"))
      .when(d % 4 === 1, lit("same")).when(d % 4 === 2, lit("x")).otherwise(lit("abcd"))
    graft.ops.Dialogs.validatePreferencePairs(
      Tables.documents(s, dir).select(
        d, concat(lit("p"), d.cast("string")).as("prompt"),
        chosen.as("chosen"), rejected.as("rejected")),
      "prompt", "chosen", "rejected")
      .select("doc_id", "identical", "has_empty", "len_ratio", "valid")
  }

  /** Corpus length-bias readout ([[graft.ops.Dialogs.preferenceBias]])
    * over the same fixture: one row, counts + rates the oracle
    * recomputes from the residue populations. */
  private def qPrefBias(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val chosen = when(d % 4 === 0, lit("longer answer ok"))
      .when(d % 4 === 1, lit("same")).when(d % 4 === 2, lit("")).otherwise(lit("ab"))
    val rejected = when(d % 4 === 0, lit("short"))
      .when(d % 4 === 1, lit("same")).when(d % 4 === 2, lit("x")).otherwise(lit("abcd"))
    graft.ops.Dialogs.preferenceBias(
      Tables.documents(s, dir).select(
        d, concat(lit("p"), d.cast("string")).as("prompt"),
        chosen.as("chosen"), rejected.as("rejected")),
      "prompt", "chosen", "rejected")
  }

  /** Anchor-text term rollup ([[graft.ops.Urls.anchorTermStats]]) over
    * a synthesized page shell: each doc links to its successor site
    * with an anchor text chosen by doc_id residue — residue 0 carries
    * inner markup (`<b>Breaking</b> News`) that must strip, and the
    * News/news case split must fold. The oracle states each residue's
    * expected TERMS literally from the doc_id arithmetic — extraction,
    * tag-stripping, and tokenization never run on the oracle side. */
  private def qAnchorText(s: SparkSession, dir: String): DataFrame = {
    val base = concat(
      lit("http://site"), (col("doc_id") % 20).cast("string"), lit(".com/idx.html"))
    val dst = concat(lit("site"), ((col("doc_id") + 1) % 20).cast("string"), lit(".com"))
    val anchor = when(col("doc_id") % 3 === 0, lit("<b>Breaking</b> News"))
      .when(col("doc_id") % 3 === 1, lit("news archive"))
      .otherwise(lit("Sports"))
    val html = concat(
      lit("<html><body><a href=\"http://"), dst, lit("/p\">"), anchor,
      lit("</a></body></html>"))
    graft.ops.Urls.anchorTermStats(
      Tables.documents(s, dir).select(col("doc_id"), base.as("base_url"), html.as("html")),
      "html", "base_url", topM = 3)
  }

  /** Crawl-policy gate ([[graft.ops.Urls.parseRobotsRules]] →
    * [[graft.ops.Urls.filterDisallowedPaths]]), RFC 9309 semantics:
    * three robots flavors by domain index mod 3 — (0) plain Disallow
    * prefixes with an INLINE comment on the /tmp/ value that must
    * still parse, plus a shorter Allow that must lose longest-match;
    * (1) Disallow-/ with an Allow-/public/ carve-out (the case a
    * Disallow-only read drops entirely); (2) a slash-`*.html$`
    * wildcard Disallow with a longer Allow-/articles/ carve-out.
    * Applied to
    * one URL per document, host-keyed. The oracle never parses,
    * wildcard-matches, or ranks — it states the surviving residues
    * literally from the doc_id arithmetic (each flavor yields a
    * DIFFERENT survivor set, so any precedence/comment/wildcard bug
    * changes the hash). */
  private def qRobotsFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sec = when(col("doc_id") % 4 === 0, lit("private"))
      .when(col("doc_id") % 4 === 1, lit("tmp"))
      .when(col("doc_id") % 4 === 2, lit("articles"))
      .otherwise(lit("public"))
    val urls = docs.select(
      col("doc_id"),
      concat(
        lit("http://site"), (col("doc_id") % 20).cast("string"), lit(".com/"),
        sec, lit("/p"), col("doc_id").cast("string"), lit(".html")).as("url"))
    val flavor = (col("doc_id") % 20) % 3
    val robotsTxt = when(
      flavor === 0,
      lit("User-agent: *\nDisallow: /private/\nDisallow: /tmp/ # temp mirror\nAllow: /\n"))
      .when(flavor === 1, lit("User-agent: *\nDisallow: /\nAllow: /public/\n"))
      .otherwise(lit("User-agent: *\nDisallow: /*.html$\nAllow: /articles/\n"))
    val robots = docs.where(col("doc_id") < 20).select(
      concat(lit("site"), col("doc_id").cast("string"), lit(".com")).as("domain"),
      robotsTxt.as("robots"))
    val rules = graft.ops.Urls.parseRobotsRules(robots, "robots", "domain")
    graft.ops.Urls.filterDisallowedPaths(urls, "url", rules)
  }

  /** Weighted sampling without replacement ([[graft.ops.Mixture
    * .prioritySample]], Efraimidis–Spirakis A-ES): top-100 documents by
    * u^(1/n_tokens) — token-count-proportional selection with an
    * exact-k guarantee, deterministic from the salt. Global form:
    * TakeOrderedAndProject, no global sort. */
  private def qPrioritySample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Mixture.prioritySample(
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      k = 100, weightCol = "n_tokens", salt = "prio1")

  /** Deterministic typo-domain column: 50 md5-derived 8-hex hostnames;
    * every `doc_id % 7 == 0` row mis-spells its hostname by DELETING
    * the 4th hex character — the planted typosquat mass
    * [[qFuzzyJoin]]/[[qFuzzyLink]] must recover. Pure arithmetic in
    * doc_id, respelled verbatim by the oracle. */
  private def typoDomainHash: org.apache.spark.sql.Column =
    md5((col("doc_id") % 50).cast("string").cast("binary"))

  private def typoDomain: org.apache.spark.sql.Column = {
    val h = typoDomainHash
    when(
      col("doc_id") % 7 === 0,
      concat(substring(h, 1, 3), substring(h, 5, 4), lit(".example.com")))
      .otherwise(concat(substring(h, 1, 8), lit(".example.com")))
  }

  /** Edit-distance near-domain pairs ([[graft.ops.FuzzyJoin
    * .editDistancePairs]]): FastSS deletion-neighborhood candidates,
    * ONE exchange on the variant key, exact levenshtein verify — no
    * all-pairs anywhere. The oracle brute-forces the ~100-string
    * distinct-domain universe (bounded by construction; the operator's
    * plan is the one that runs on an unbounded crawl). */
  private def qFuzzyJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin
      .editDistancePairs(
        Tables.documents(s, dir).select(typoDomain.as("domain")), "domain", maxDist = 1)
      .select(col("str_a").as("domain_a"), col("str_b").as("domain_b"), col("dist"))

  /** Fuzzy linkage serve form ([[graft.ops.FuzzyJoin
    * .linkToDictionary]]): each mis-spelled domain links to its best
    * dictionary entry (min distance, bytewise tie-break) through the
    * same deletion-variant equi-join — the noisy-key entity-resolution
    * shape. */
  private def qFuzzyLink(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val h = typoDomainHash
    val probes = docs
      .where(col("doc_id") % 7 === 0)
      .select(concat(substring(h, 1, 3), substring(h, 5, 4), lit(".example.com")).as("probe"))
    val dict = docs.select(concat(substring(h, 1, 8), lit(".example.com")).as("domain"))
    graft.ops.FuzzyJoin.linkToDictionary(probes, "probe", dict, "domain", maxDist = 1)
  }

  /** Exact phrase search, batch HOF form ([[graft.ops.Phrase
    * .phraseMatches]]) — overlapping token-level matches, zero shuffle.
    * The indexed serving form is spec-pinned equal (PhraseSpec). */
  private def qPhraseSearch(s: SparkSession, dir: String): DataFrame =
    graft.ops.Phrase.phraseMatches(Tables.documents(s, dir), "batch batch")

  /** CCNet-style per-language perplexity thirds ([[graft.ops.Lm
    * .ccnetBuckets]]) — value-cut head/middle/tail, histogram-broadcast
    * plan (no per-language corpus window). */
  private def qCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    graft.ops.Lm.ccnetBuckets(Tables.documents(s, dir))

  /** Perceptual image hash over REAL decoded pixels ([[graft.ops
    * .Multimodal.dhash]]): JDK decode → integer gray box-resize to 9×8
    * → 64-bit gradient-sign hash, emitted as unsigned 32-bit halves.
    * The paired fixture plants near-duplicates (single-pixel edits);
    * the oracle recomputes every bit arithmetically — no decoder on
    * the oracle side. */
  private def qImageDhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.dhash(
      graft.ops.Multimodal.imageFixturePaired(s, nBase = 30), "img_id")

  /** Fixed-point DCT perceptual hash ([[graft.ops.Multimodal.phash]])
    * over the same decoded fixture — the blur/re-encode-robust
    * companion to the dHash gradient signs; integer end to end, so
    * the oracle replays it exactly. */
  private def qImagePhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.phash(
      graft.ops.Multimodal.imageFixturePaired(s, nBase = 30), "img_id")

  /** Banded near-duplicate image pairs over the dHashes (pigeonhole
    * candidates + exact bit_count ≤ 2) — no all-pairs anywhere; the
    * oracle brute-forces the 60-image fixture. */
  private def qImageNearDup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.dhashNearDupPairs(
      graft.ops.Multimodal.dhash(
        graft.ops.Multimodal.imageFixturePaired(s, nBase = 30), "img_id"),
      "img_id", maxHamming = 2)

  /** Voice-activity segments over the REAL WAV decode chain
    * ([[graft.ops.Multimodal.vadSegments]]): energy gate at mean-square
    * 3.58e8 (≈ the fixture's uniform-PCM expectation, so frames split
    * both ways), gaps-and-islands per clip. The oracle recomputes
    * frames AND segmentation from the raw sample arithmetic. */
  private def qVad(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.vadSegments(
      graft.ops.Multimodal.audioFixture(s, n = 40), "aud_id",
      frameSize = 160, thrMeanSq = 358000000L)

  /** Generic keyed backward as-of join ([[graft.ops.AsOf
    * .asofBackward]]): every click event carries the latest prior
    * purchase value for its user — union-tag + one window, single
    * shuffle, no range join. Oracle: DuckDB's NATIVE `ASOF LEFT JOIN`
    * (a fully independent engine implementation of the semantics). */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val left = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val right = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us").agg(max("value").as("purchase_value"))
    graft.ops.AsOf
      .asofBackward(left, right, Seq("user_id"), "ts_us", Seq("purchase_value"))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        round(col("purchase_value"), 4).as("last_purchase"))
  }

  private def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
    val left = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val right = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us").agg(max("value").as("purchase_value"))
    (left, right)
  }

  /** FORWARD as-of ([[graft.ops.AsOf.asofForward]]): each click joined
    * to the user's NEXT purchase at-or-after it — the look-ahead twin
    * of q_asof_join, oracle = DuckDB native ASOF with `>=`. */
  private def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val (left, right) = asofSides(s, dir)
    graft.ops.AsOf
      .asofForward(left, right, Seq("user_id"), "ts_us", Seq("purchase_value"))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        round(col("purchase_value"), 4).as("next_purchase"))
  }

  /** NEAREST as-of with a 1-hour tolerance ([[graft.ops.AsOf
    * .asofNearest]]): the closer purchase in time, ties backward,
    * matches farther than an hour nulled — pandas merge_asof
    * (direction="nearest", tolerance=...) semantics; oracle composes
    * DuckDB's two ASOF directions and restates the pick literally. */
  private def qAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val (left, right) = asofSides(s, dir)
    graft.ops.AsOf
      .asofNearest(
        left, right, Seq("user_id"), "ts_us", Seq("purchase_value"),
        tolerance = Some(3600000000L))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        round(col("purchase_value"), 4).as("near_purchase"))
  }

  /** Embedding-space outlier screen ([[graft.ops.Similarity
    * .centroidOutliers]]): per-label centroid distance, z-scored —
    * DECIMAL-exact centroid sums, distances rounded before stats. */
  private def qEmbedOutliers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.centroidOutliers(Tables.embeddings(s, dir))

  /** Hard-negative mining through the IVF index ([[graft.ops.Ivf
    * .hardNegativesIndexed]]): top-8 most-similar DIFFERENT-label
    * vectors per query, candidates from probed cells with the label
    * inequality applied per bucket — a hash join on `cell`, no
    * nested-loop plan. Full probing (nProbe == nLists) makes the result
    * EXACTLY the brute-force [[graft.ops.Similarity.hardNegatives]]
    * (retained as the recall oracle — IvfSpec measures recall at
    * nProbe < nLists), which is what the oracle SQL computes. */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val (assigned, centroids) = Ivf.assignCells(e, nLists = 8)
    Ivf.hardNegativesIndexed(assigned, centroids, e.where(col("vec_id") < 5), k = 8, nProbe = 8)
  }

  /** Winnowing fingerprints ([[graft.ops.Text.winnowFingerprints]],
    * k=3 token grams, window 4): the MOSS partial-overlap signature —
    * any ≥6-token shared substring shares a fingerprint. */
  private def qWinnow(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.winnowFingerprints(Tables.documents(s, dir), k = 3, w = 4)

  /** Per-doc 3-gram novelty ([[graft.ops.Text.novelty]]): fraction of
    * distinct grams with corpus df = 1 — join-free (gram df aggregate
    * carries min(doc_id), so df-1 grams route straight to their owner). */
  private def qNovelty(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.novelty(Tables.documents(s, dir), k = 3)

  /** MOSS overlap report ([[graft.ops.Text.winnowOverlapPairs]]): doc
    * pairs sharing ≥ 3 winnow fingerprints (doc-freq-capped buckets,
    * pairs from one aggregate — no all-pairs). */
  private def qWinnowPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.winnowOverlapPairs(
      Tables.documents(s, dir), k = 3, w = 4, minShared = 3, maxDocFreq = 50)

  /** Tokenizer-coverage report ([[graft.ops.Text.oovRate]], vocab =
    * corpus top-20 unigrams): per-doc OOV fraction via the one-pass
    * token-set kernel — no explode, no join. */
  private def qOovRate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.oovRate(Tables.documents(s, dir), vocabSize = 20)

  /** Compression-ratio quality signal ([[graft.ops.Text
    * .compressionRatio]]) over texts SYNTHESIZED from the doc_id
    * residue (r incompressible md5 blocks + (10−r) prose repeats), so
    * the deflate sizes depend only on r ∈ 0..9 and the oracle can
    * carry them as a GOLDEN LITERAL table — precomputed with CPython's
    * zlib (raw stream, level 6, tools/gen_deflate_goldens.py), an
    * implementation independent of the JDK Deflater the
    * [[graft.functions.DeflateSize]] kernel runs. That turns the one
    * formerly rows-only query into a full hash row: byte counts and
    * the 4dp ratio arithmetic are recomputed SQL-side, the deflate
    * values are cross-implementation-checked literals. The
    * corpus-text form of the operator stays spec-pinned
    * (TextFilterSpec monotonicity/empty/multibyte fixtures). */
  private def qCompressRatio(s: SparkSession, dir: String): DataFrame = {
    val r = (col("doc_id") % 10).cast("int")
    val text = concat(
      repeat(md5(r.cast("string").cast("binary")), r),
      repeat(lit("the quick brown fox jumps over the lazy dog "), lit(10) - r))
    graft.ops.Text.compressionRatio(
      Tables.documents(s, dir).select(col("doc_id"), text.as("text")))
  }

  /** Flesch readability ([[graft.ops.Text.readability]]) over the
    * document text with a fixed punctuation suffix (so the sentence
    * counter sees >1 sentence); words/syllables/both scores recomputed
    * SQL-side from the identical vowel-run heuristic. */
  private def qReadability(s: SparkSession, dir: String): DataFrame =
    graft.ops.Text.readability(
      Tables.documents(s, dir).select(
        col("doc_id"),
        concat(col("text"), lit(". The queue? Yes!")).as("text")))

  /** Count-min sketch estimates ([[graft.ops.Cardinality
    * .cmsEstimates]]) over document tokens at a deliberately SMALL
    * width (w = 32 < vocabulary) so collision overestimates are real
    * and the min-over-rows logic is load-bearing; the oracle replays
    * the identical salted-hash sketch, collisions included. */
  private def qCms(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cardinality.cmsEstimates(
      Tables.documents(s, dir).select(explode(split(col("text"), " ")).as("tok")),
      "tok", d = 4, w = 32, topN = 20)

  /** Join-size estimation ([[graft.ops.Cardinality.joinSizeEstimate]])
    * for lineitem ⋈ orders on orderkey — the planning primitive that
    * decides broadcast/shuffle/salt from two d×w sketches without
    * co-shuffling either side. The oracle replays the identical
    * sketch inner product, collisions included. */
  private def qJoinSize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cardinality.joinSizeEstimate(
      Tables.lineitem(s, dir), "l_orderkey",
      Tables.orders(s, dir), "o_orderkey",
      d = 4, w = 4096)

  /** Bloom semi-join screen ([[graft.ops.Bloom.screen]], m = 2^16,
    * k = 3): lineitem rows whose orderkey MIGHT be an urgent order —
    * the shuffle-free membership pre-filter for the 100 TB side (the
    * filter is a stateless codegen'd projection over the broadcast
    * word array; the big side joins nothing). The urgent key set
    * deliberately OVERLOADS the filter (~1.4 keys/bit at sf0.1 →
    * ~13% false-positive rate), so the oracle checks the exact
    * deterministic false-positive set, not just the members. */
  private def qBloomScreen(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    graft.ops.Bloom
      .screen(Tables.lineitem(s, dir), "l_orderkey", urgent, "o_orderkey",
        m = 1 << 16, k = 3)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** O2 total-order global sort ([[graft.ts.GlobalSort
    * .rankByValueBuckets]]): two-pass value-bucket recipe — no
    * single-task global window; rank is a pure function of the data. */
  private def qGlobalSort(s: SparkSession, dir: String): DataFrame =
    graft.ts.GlobalSort
      .rankByValueBuckets(
        Tables.events(s, dir).select("event_id", "ts_us"), "ts_us", Seq("event_id"))
      .select("rank", "event_id", "ts_us")

  /** W5 epoch-bounded CHUNKED zero-phase filtering against the SAME
    * recursive-CTE oracle as q_filtfilt: small buffer/overlap forces
    * real chunk splits + boundary duplication, and the overlap is long
    * enough that core rows match the whole-segment filter at the 6dp
    * round (the order-2 Butterworth impulse response is far below 1e-6
    * after 96 samples). Puts W5 in the hard oracle signal. */
  private def qFiltfiltChunked(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "value")
    val sos = graft.dsp.FilterDesign.butter(2, Seq(0.25), graft.dsp.FilterDesign.Lowpass)
    // chunk on a CONTIGUOUS per-user sample index, not the sparse global
    // event_id — the overlap is warm-up SAMPLES, so the chunk axis must
    // be dense in rows for 96 units to mean 96 rows of IIR settling
    val withIdx = ev.withColumn(
      "idx",
      (row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")) - 1).cast("long"))
    graft.dsp.SosFiltFilt
      .filtfiltChunked(withIdx, sos, Seq("user_id"), "idx", "value",
        bufferLen = 256L, overlapLen = 96L, carry = Seq("event_id"))
      .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value"))
  }

  /** Scalable containment join ([[graft.ts.IntervalJoin]]): every
    * event attributed to the global session epoch containing it —
    * bucketized equi-join + exact post-filter, no BNLJ. */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "ts_us")
    val epochs = qSessionEpochs(s, dir).select("segment_id", "start_us", "stop_us")
    graft.ts.IntervalJoin
      .containmentJoin(ev, epochs, "ts_us", "start_us", "stop_us",
        bucketWidth = 900000000L)
      .select("event_id", "ts_us", "segment_id")
  }

  /** F8 frange in the hard signal: per-user sample grids with a
    * non-divisible step (0.37 s over a capped duration) — exercising
    * the reference's linspace-not-step semantics
    * ([[graft.functions.Funcs.frange]]; jagular/utils.py:17-22). */
  private def qFrange(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(least((max("ts_us") - min("ts_us")) / lit(1e6), lit(20.0)).as("stop"))
    b.select(
        col("user_id"),
        posexplode(graft.functions.Funcs.frange(lit(0.0), col("stop"), lit(0.37)))
          .as(Seq("i", "v")))
      .select(col("user_id"), col("i").cast("long").as("i"), round(col("v"), 6).as("v"))
  }

  /** F12 integrality report over the events value column
    * ([[graft.ts.Validation.nonIntegralCount]]) — the `v % 1 ≠ 0`
    * spelling is identical on both engines including NaN/±Inf and is
    * ANSI-overflow-free (see the op scaladoc). */
  private def qIntegrality(s: SparkSession, dir: String): DataFrame =
    graft.ts.Validation.nonIntegralCount(Tables.events(s, dir), "value")

  /** Z-order layout clustering in the hard signal
    * ([[graft.ops.ZOrder]]): Morton code over (user_id, ts_us) with
    * integer-only quantization (division-only — ANSI-overflow-free on
    * µs timestamps). The per-z-prefix bucket profile covers EVERY row,
    * so quantize+interleave are pinned bit-exactly; the DuckDB side is
    * generated by the same [[graft.ops.ZOrder.interleaveSql]] spelling,
    * so engine and oracle cannot drift structurally. The layout/pruning
    * payoff is measured in ZOrderBench (COVERAGE.md). */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    graft.ops.ZOrder.withZValue(ev, Seq("user_id", "ts_us"), bits = 16)
      .groupBy(shiftright(col("z"), 24).as("z_bucket"))
      .agg(count(lit(1)).as("n"), min("z").as("z_min"), max("z").as("z_max"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> (qZorder _),
    "q_frange" -> (qFrange _),
    "q_integrality" -> (qIntegrality _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_global_sort" -> (qGlobalSort _),
    "q_filtfilt_chunked" -> (qFiltfiltChunked _),
    "q_compress_ratio" -> (qCompressRatio _),
    "q_oov_rate" -> (qOovRate _),
    "q_winnow_pairs" -> (qWinnowPairs _),
    "q_novelty" -> (qNovelty _),
    "q_winnow" -> (qWinnow _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_asof_join" -> (qAsofJoin _),
    "q_vad" -> (qVad _),
    "q_image_dhash" -> (qImageDhash _),
    "q_image_phash" -> (qImagePhash _),
    "q_image_neardup" -> (qImageNearDup _),
    "q_ccnet_buckets" -> (qCcnetBuckets _),
    "q_phrase_search" -> (qPhraseSearch _),
    "q_url_normalize" -> (qUrlNormalize _),
    "q_url_curation" -> (qUrlCuration _),
    "q_domain_stats" -> (qDomainStats _),
    "q_url_dedup" -> (qUrlDedup _),
    "q_rec_catalog" -> (qRecCatalog _),
    "q_rec_session" -> (qRecSession _),
    "q_rec_extract" -> (qRecExtract _),
    "q_rec_uv" -> (qRecUv _),
    "q_session_epochs" -> (qSessionEpochs _),
    "q_user_sessions" -> (qUserSessions _),
    "q_gap_stats" -> (qGapStats _),
    "q_median_step" -> (qMedianStep _),
    "q_dedup_keep_first" -> (qDedupKeepFirst _),
    "q_gapfill" -> (qGapFill _),
    "q_ts_validation" -> (qTsValidation _),
    "q_event_windows" -> (qEventWindows _),
    "q_zscore" -> (qZscore _),
    "q_psd" -> (qPsd _),
    "q_band_power" -> (qBandPower _),
    "q_stft" -> (qStft _),
    "q_mad_crossings" -> (qMadCrossings _),
    "q_patch_extract" -> (qPatchExtract _),
    "q_running_sum" -> (qRunningSum _),
    "q1_pricing" -> (q1Pricing _),
    "q3_revenue" -> (q3Revenue _),
    "q_doc_stats" -> (qDocStats _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_sim_topk" -> (qSimTopK _),
    "q_pca_project" -> (qPcaProject _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_containment" -> (qContainment _),
    "q_dup_rate" -> (qDupRate _),
    "q_vocab" -> (qVocab _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_incremental_verified" -> (qDedupIncrementalVerified _),
    "q_pq_topk" -> (qPqTopk _),
    "q_ivfpq_topk" -> (qIvfPqTopk _),
    "q_ivfpq_serve" -> (qIvfPqServe _),
    "q_chunk_docs" -> (qChunkDocs _),
    "q_corpus_stats" -> (qCorpusStats _),
    "q_split_assign" -> (qSplitAssign _),
    "q_shuffle" -> (qShuffle _),
    "q_spike_censor" -> (qSpikeCensor _),
    "q_spike_censor_keyed" -> (qSpikeCensorKeyed _),
    "q_decimate" -> (qDecimate _),
    "q_tetrode" -> (qTetrode _),
    "q_lang_id" -> (qLangId _),
    "q_lang_margin" -> (qLangMargin _),
    "q_fingerprints" -> (qFingerprints _),
    "q_simhash" -> (qSimhash _),
    "q_multimodal" -> (qMultimodal _),
    "q_image_resize" -> (qImageResize _),
    "q_audio_frames" -> (qAudioFrames _),
    "q_filtfilt" -> (qFiltfilt _),
    "q_align" -> (qAlign _),
    "q_embed_neardup" -> (qEmbedNearDup _),
    "q_sign_lsh" -> (qSignLsh _),
    "q_ivf_topk" -> (qIvfTopK _),
    "q_ivf_serve" -> (qIvfServe _),
    "q_bq_serve" -> (qBqServe _),
    "q_car" -> (qCar _),
    "q5_nation" -> (q5Nation _),
    "q6_forecast" -> (q6Forecast _),
    "q_align_linear" -> (qAlignLinear _),
    "q_fir_smooth" -> (qFirSmooth _),
    "q_decimate_fir" -> (qDecimateFir _),
    "q_token_bpe" -> (qTokenBpe _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_simhash_neardup" -> (qSimhashNearDup _),
    "q_frames" -> (qFrames _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_canonical" -> (qDedupCanonical _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_pagerank" -> (qPagerank _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_decontam_fuzzy" -> (qDecontamFuzzy _),
    "q_decontam_fuzzy_verified" -> (qDecontamFuzzyVerified _),
    "q_repetition" -> (qRepetition _),
    "q_mixture" -> (qMixture _),
    "q_temperature_sample" -> (qTemperatureSample _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_shard_assign" -> (qShardAssign _),
    "q_pack" -> (qPack _),
    "q_top_ngrams" -> (qTopNgrams _),
    "q_top_ngrams_sketch" -> (qTopNgramsSketch _),
    "q_curate" -> (qCurate _),
    "q_lm_score" -> (qLmScore _),
    "q_lm_bigram" -> (qLmBigram _),
    "q_lm_trigram" -> (qLmTrigram _),
    "q_dup_spans" -> (qDupSpans _),
    "q_strip_spans" -> (qStripSpans _),
    "q_line_dedup" -> (qLineDedup _),
    "q_dsir" -> (qDsir _),
    "q_dsir_bigram" -> (qDsirBigram _),
    "q_redact" -> (qRedact _),
    "q_bm25" -> (qBm25 _),
    "q_bm25_serve" -> (qBm25Serve _),
    "q_semdedup" -> (qSemDedup _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_token_budget" -> (qTokenBudget _),
    "q_quality_gate" -> (qQualityGate _),
    "q_json_extract" -> (qJsonExtract _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_normalize" -> (qNormalize _),
    "q_sq8_topk" -> (qSq8Topk _),
    "q_ivf_sq8" -> (qIvfSq8 _),
    "q_curriculum" -> (qCurriculum _),
    "q_epochs" -> (qEpochs _),
    "q_gopher" -> (qGopher _),
    "q_pmi" -> (qPmi _),
    "q_html_strip" -> (qHtmlStrip _),
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_fuzzy_link" -> (qFuzzyLink _),
    "q_label_prop" -> (qLabelProp _),
    "q_triangles" -> (qTriangles _),
    "q_kcore" -> (qKCore _),
    "q_bfs_hops" -> (qBfsHops _),
    "q_jaro_link" -> (qJaroLink _),
    "q_item_pairs" -> (qItemPairs _),
    "q_ppr" -> (qPpr _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_zipf" -> (qZipf _),
    "q_conformal" -> (qConformal _),
    "q_markov" -> (qMarkov _),
    "q_fairness" -> (qFairness _),
    "q_xcorr" -> (qXcorr _),
    "q_ripples" -> (qRipples _),
    "q_coherence" -> (qCoherence _),
    "q_knn_graph" -> (qKnnGraph _),
    "q_modularity" -> (qModularity _),
    "q_sta" -> (qSta _),
    "q_t_closeness" -> (qTCloseness _),
    "q_cuped" -> (qCuped _),
    "q_ks_test" -> (qKsTest _),
    "q_mannwhitney" -> (qMannWhitney _),
    "q_winsorize" -> (qWinsorize _),
    "q_mojibake" -> (qMojibake _),
    "q_trailing_features" -> (qTrailingFeatures _),
    "q_k_anon" -> (qKAnon _),
    "q_l_diversity" -> (qLDiversity _),
    "q_ab_test" -> (qAbTest _),
    "q_acf" -> (qAcf _),
    "q_twap" -> (qTwap _),
    "q_profile_drift" -> (qProfileDrift _),
    "q_attribution" -> (qAttribution _),
    "q_quantiles" -> (qQuantiles _),
    "q_target_encode" -> (qTargetEncode _),
    "q_snm_dedup" -> (qSnmDedup _),
    "q_profile" -> (qProfile _),
    "q_skew_advisor" -> (qSkewAdvisor _),
    "q_readability" -> (qReadability _),
    "q_cms" -> (qCms _),
    "q_join_size" -> (qJoinSize _),
    "q_bloom_screen" -> (qBloomScreen _),
    "q_link_graph" -> (qLinkGraph _),
    "q_warc_extract" -> (qWarcExtract _),
    "q_warc_links" -> (qWarcLinks _),
    "q_warcgz_crawl" -> (qWarcGzCrawl _),
    "q_warc_dechunk" -> (qWarcDechunk _),
    "q_dialog_qa" -> (qDialogQa _),
    "q_dialog_flatten" -> (qDialogFlatten _),
    "q_dialog_roles" -> (qDialogRoles _),
    "q_dialog_dedup" -> (qDialogDedup _),
    "q_pref_qa" -> (qPrefQa _),
    "q_pref_bias" -> (qPrefBias _),
    "q_link_authority" -> (qLinkAuthority _),
    "q_distinct_sketch" -> (qDistinctSketch _),
    "q_cdc_chunks" -> (qCdcChunks _),
    "q_cdc_dedup" -> (qCdcDedup _),
    "q_anchor_text" -> (qAnchorText _),
    "q_priority_sample" -> (qPrioritySample _),
    "q_robots_filter" -> (qRobotsFilter _),
    "q_asof_forward" -> (qAsofForward _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_cusum" -> (qCusum _),
    "q_funnel" -> (qFunnel _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_hits" -> (qHits _),
    "q_changelog_compact" -> (qChangelogCompact _),
    "q_scd2" -> (qScd2 _),
    "q_setsim_join" -> (qSetsimJoin _),
    "q_resample" -> (qResample _),
    "q_cocitation" -> (qCocitation _),
    "q_majority_vote" -> (qMajorityVote _),
    "q_kappa" -> (qKappa _),
    "q_reliability" -> (qReliability _),
    "q_threshold" -> (qThreshold _),
    "q_class_report" -> (qClassReport _),
    "q_ece" -> (qEce _),
    "q_rater_accuracy" -> (qRaterAccuracy _),
    "q_keywords" -> (qKeywords _),
    "q_token_drift" -> (qTokenDrift _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_overlap_join" -> (qOverlapJoin _),
    "q_quantile_bin" -> (qQuantileBin _),
    "q_split_leak" -> (qSplitLeak _),
    "q_crawl_schedule" -> (qCrawlSchedule _),
    "q_water_fill" -> (qWaterFill _),
    "q_chisq" -> (qChisq _),
    "q_benford" -> (qBenford _),
    "q_concentration" -> (qConcentration _),
    "q_ewma" -> (qEwma _),
    "q_psi" -> (qPsi _),
    "q_group_quantiles" -> (qGroupQuantiles _),
    "q_fk_orphans" -> (qFkOrphans _),
    "q_krippendorff" -> (qKrippendorff _),
    "q_growth" -> (qGrowth _),
    "q_growth_dense" -> (qGrowthDense _),
    "q_dau" -> (qDau _),
    "q_class_weights" -> (qClassWeights _),
    "q_ari" -> (qAri _),
    "q_seasonal" -> (qSeasonal _),
    "q_sprt" -> (qSprt _),
    "q_isotonic" -> (qIsotonic _),
    "q_isotonic_score" -> (qIsotonicScore _),
    "q_rules" -> (qRules _),
    "q_embed_audit" -> (qEmbedAudit _),
    "q_step_timing" -> (qStepTiming _),
    "q_linear_fit" -> (qLinearFit _),
    "q_entropy" -> (qEntropy _)
  )

  /** q_pagerank: the operator's recurrence unrolled as chained CTEs —
    * a TRUE independent oracle (DuckDB recomputes the power iteration
    * from the raw tables; nothing is copied from the Spark run). The
    * arithmetic is spelled identically term by term ((1-d)·(1/n) + …)
    * so the two engines walk the same float chain. */
  /** The power-iteration recurrence over a caller-supplied
    * `edges(src, dst, w)` CTE chain — shared by [[pagerankOracleSql]]
    * and the q_link_authority oracle (same arithmetic, different
    * graphs). */
  private def pagerankRecurrenceSql(edgesCtes: String, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT nd.node,
         |         (1.0 - 0.85) * (1.0 / nn.n) + 0.85 * (COALESCE(c.in_rank, 0) + d.dm * (1.0 / nn.n)) AS pr
         |  FROM nodes nd
         |  CROSS JOIN nn
         |  LEFT JOIN (SELECT m.dst AS node, SUM(r.pr * m.p) AS in_rank
         |             FROM m JOIN $prev r ON r.node = m.src GROUP BY m.dst) c ON c.node = nd.node
         |  CROSS JOIN (SELECT COALESCE(SUM(r.pr), 0) AS dm FROM $prev r
         |              WHERE NOT EXISTS (SELECT 1 FROM outw o WHERE o.src = r.node)) d)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCtes,
       |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
       |m AS (SELECT e.src, e.dst, e.w / o.out_w AS p FROM edges e JOIN outw o ON e.src = o.src),
       |r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node, ROUND(pr, 6) AS pr FROM r$iterations""".stripMargin
  }

  /** Personalized-PageRank recurrence unrolled: identical to
    * [[pagerankRecurrenceSql]] except the restart/dangling factor is
    * the per-node seed distribution `sv.s` (1/|S∩V| on seeds, 0
    * elsewhere) instead of 1/N, and r0 = that distribution — term for
    * term what the operator's `__s` column computes. */
  private def pprRecurrenceSql(
      edgesCtes: String, seedsCte: String, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT sv.node,
         |         (1.0 - 0.85) * sv.s + 0.85 * (COALESCE(c.in_rank, 0) + d.dm * sv.s) AS pr
         |  FROM sv
         |  LEFT JOIN (SELECT m.dst AS node, SUM(r.pr * m.p) AS in_rank
         |             FROM m JOIN $prev r ON r.node = m.src GROUP BY m.dst) c ON c.node = sv.node
         |  CROSS JOIN (SELECT COALESCE(SUM(r.pr), 0) AS dm FROM $prev r
         |              WHERE NOT EXISTS (SELECT 1 FROM outw o WHERE o.src = r.node)) d)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCtes,
       |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
       |outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
       |m AS (SELECT e.src, e.dst, e.w / o.out_w AS p FROM edges e JOIN outw o ON e.src = o.src),
       |seeds0 AS ($seedsCte),
       |seedsp AS (SELECT DISTINCT s.node FROM seeds0 s JOIN nodes nd ON nd.node = s.node),
       |sk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seedsp),
       |sv AS (SELECT nd.node, CASE WHEN sp.node IS NOT NULL THEN 1.0 / sk.k ELSE 0.0 END AS s
       |       FROM nodes nd LEFT JOIN seedsp sp ON sp.node = nd.node CROSS JOIN sk),
       |r0 AS (SELECT node, s AS pr FROM sv),
       |$iters
       |SELECT node, ROUND(pr, 6) AS pr FROM r$iterations""".stripMargin
  }

  private lazy val pagerankOracleSql: String =
    pagerankRecurrenceSql(
      """arcs AS (
        |  SELECT 2 * o_custkey AS cn, 2 * l_suppkey + 1 AS sn, CAST(COUNT(*) AS DOUBLE) AS w
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT cn AS src, sn AS dst, w FROM arcs
        |  UNION ALL
        |  SELECT sn AS src, cn AS dst, w FROM arcs)""".stripMargin,
      iterations = 5)

  /** The q_link_graph edge list respelled literally from the doc_id
    * arithmetic (extraction/resolution never run on the oracle side) —
    * shared by the q_link_authority and q_hits oracles. */
  private val linkGraphEdgesCtes: String =
    """lg AS (SELECT doc_id,
      |  'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS s,
      |  'site' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com' AS d FROM documents),
      |le AS (
      |  SELECT s, d FROM lg WHERE doc_id % 5 = 0
      |  UNION ALL SELECT s, d FROM lg WHERE doc_id % 5 = 1
      |  UNION ALL SELECT s, s FROM lg WHERE doc_id % 5 = 2
      |  UNION ALL SELECT s, s FROM lg WHERE doc_id % 5 = 2
      |  UNION ALL SELECT s, s FROM lg WHERE doc_id % 5 = 3
      |  UNION ALL SELECT s, 'example.org' FROM lg),
      |edges AS (SELECT s AS src, d AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      |          FROM le GROUP BY 1, 2)""".stripMargin

  /** q_link_authority: the q_link_graph edge list pushed through the
    * same recurrence — the end-to-end crawl→graph→authority chain. */
  private lazy val linkAuthorityOracleSql: String =
    pagerankRecurrenceSql(linkGraphEdgesCtes, iterations = 5)

  /** q_hits: the HITS mutual recurrence unrolled term for term — per
    * round, an L1-normalized hub-weighted in-sum (authority) then an
    * L1-normalized authority-weighted out-sum (hub), exactly as
    * [[graft.ops.Graph.hits]] computes them; the final SELECT widens
    * one-sided nodes to literal 0 the way the operator does. */
  private def hitsRecurrenceSql(edgesCtes: String, iterations: Int): String = {
    // each CTE references its predecessor exactly ONCE (the L1
    // normalizer is a window SUM, not a scalar subquery) — DuckDB
    // inlines non-materialized CTEs per reference, so a second
    // reference per step would re-expand the whole chain 4^k times
    val iters = (1 to iterations).map { k =>
      s"""a$k AS (SELECT node, v / SUM(v) OVER () AS authority FROM (
         |  SELECT e.dst AS node, SUM(h.hub * e.w) AS v
         |  FROM edges e JOIN h${k - 1} h ON h.node = e.src GROUP BY e.dst)),
         |h$k AS (SELECT node, v / SUM(v) OVER () AS hub FROM (
         |  SELECT e.src AS node, SUM(a.authority * e.w) AS v
         |  FROM edges e JOIN a$k a ON a.node = e.dst GROUP BY e.src))""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCtes,
       |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |h0 AS (SELECT node, 1.0 / nn.n AS hub FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT nd.node,
       |       ROUND(COALESCE(a.authority, 0), 6) AS authority,
       |       ROUND(COALESCE(h.hub, 0), 6) AS hub
       |FROM nodes nd
       |LEFT JOIN a$iterations a ON a.node = nd.node
       |LEFT JOIN h$iterations h ON h.node = nd.node""".stripMargin
  }

  private lazy val hitsOracleSql: String =
    hitsRecurrenceSql(linkGraphEdgesCtes, iterations = 5)

  /** q_label_prop: synchronous LPA unrolled — per round, every node
    * takes the neighbor label with the max summed weight, ties to the
    * bytewise smallest label, exactly as
    * [[graft.ops.Graph.labelPropagation]] computes it. */
  private def lpaCtesSql(edgesCtes: String, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""l$k AS (SELECT node, label FROM (
         |  SELECT sym.a AS node, l.label,
         |         row_number() OVER (PARTITION BY sym.a
         |           ORDER BY SUM(sym.w) DESC, l.label ASC) AS r
         |  FROM sym JOIN l${k - 1} l ON l.node = sym.b
         |  GROUP BY sym.a, l.label) WHERE r = 1)""".stripMargin
    }.mkString(",\n")
    s"""$edgesCtes,
       |sym AS MATERIALIZED (SELECT a, b, SUM(w) AS w FROM (
       |  SELECT src AS a, dst AS b, w FROM edges
       |  UNION ALL SELECT dst AS a, src AS b, w FROM edges) t
       | WHERE a <> b GROUP BY a, b),
       |l0 AS (SELECT DISTINCT b AS node, b AS label FROM sym),
       |$iters""".stripMargin
  }

  private def lpaRecurrenceSql(edgesCtes: String, iterations: Int): String =
    s"""WITH ${lpaCtesSql(edgesCtes, iterations)}
       |SELECT node, label FROM l$iterations""".stripMargin

  private lazy val labelPropOracleSql: String =
    lpaRecurrenceSql(linkGraphEdgesCtes, iterations = 3)

  /** q_modularity: Newman Q of the LPA partition replayed — the lpa
    * CTE chain re-used verbatim, then degree / intra-weight rollups
    * and the cleared per-community form `(e2·S − d²)/S²` (all sums of
    * integral doubles — exact on both engines in any order). */
  private lazy val modularityOracleSql: String =
    s"""WITH ${lpaCtesSql(linkGraphEdgesCtes, iterations = 3)},
       |deg AS (SELECT a AS node, SUM(w) AS d FROM sym GROUP BY 1),
       |stot AS (SELECT SUM(d) AS s FROM deg),
       |nl AS (SELECT deg.node, deg.d, l3.label FROM deg JOIN l3 ON l3.node = deg.node),
       |dc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes, SUM(d) AS d_sum
       |       FROM nl GROUP BY 1),
       |intra AS (SELECT la.label, SUM(sym.w) AS e2 FROM sym
       |          JOIN l3 la ON la.node = sym.a
       |          JOIN l3 lb ON lb.node = sym.b
       |          WHERE la.label = lb.label GROUP BY 1),
       |comm AS (SELECT dc.label, dc.n_nodes, dc.d_sum,
       |           COALESCE(intra.e2, 0.0) AS e_intra2
       |         FROM dc LEFT JOIN intra ON intra.label = dc.label)
       |SELECT label, n_nodes, d_sum, e_intra2,
       |  round((e_intra2 * s - d_sum * d_sum) / (s * s), 8) AS contrib,
       |  round(SUM((e_intra2 * s - d_sum * d_sum) / (s * s)) OVER (), 6) AS q
       |FROM comm CROSS JOIN stot""".stripMargin


  /** One q_quantiles column replayed: the same min/max → equi-width
    * bucket → cumulative-count → first-bucket-past-⌈p·n⌉ chain, with
    * the width arithmetic in the identical double ops. */
  private def quantileColOracle(out: String, expr: String): String =
    s"""SELECT '$out' AS "column", CAST(pp.prob AS DOUBLE) AS prob,
       |       mm.mn + qb.qb * (CASE WHEN mm.mx > mm.mn
       |                        THEN (mm.mx - mm.mn) / 1000.0 ELSE 1.0 END) AS q_est
       |FROM (VALUES (0.5), (0.9), (0.99)) pp(prob)
       |CROSS JOIN (SELECT MIN($expr) AS mn, MAX($expr) AS mx, COUNT($expr) AS nn
       |            FROM lineitem) mm
       |JOIN LATERAL (
       |  SELECT MIN(bucket) AS qb FROM (
       |    SELECT bucket, SUM(n) OVER (ORDER BY bucket) AS cum FROM (
       |      SELECT LEAST(CAST(FLOOR(($expr - mm.mn) /
       |               (CASE WHEN mm.mx > mm.mn THEN (mm.mx - mm.mn) / 1000.0 ELSE 1.0 END))
       |             AS INTEGER), 999) AS bucket, COUNT(*) AS n
       |      FROM lineitem WHERE $expr IS NOT NULL GROUP BY 1))
       |  WHERE cum >= CEIL(CAST(pp.prob AS DOUBLE) * mm.nn)) qb ON TRUE""".stripMargin

  private lazy val quantilesOracleSql: String = Seq(
    quantileColOracle("quantity", "CAST(l_quantity AS DOUBLE)"),
    quantileColOracle("price", "CAST(l_extendedprice AS DOUBLE)")
  ).mkString("\nUNION ALL\n")

  /** One q_profile column replayed: exact stats subquery × the KMV
    * distinct replay (`ORDER BY hash LIMIT k` IS the sketch in SQL),
    * cross-joined — `valExpr` feeds the null test and the distinct
    * hash, `statExpr` the min/max/mean. */
  private def profileColOracle(
      out: String, valExpr: String, statExpr: String,
      from: String = "lineitem"): String =
    s"""SELECT '$out' AS "column", s.n_rows, s.n_null, d.n_distinct,
       |       s."min", s."max",
       |       CASE WHEN s.nn > 0 THEN
       |         CAST(CASE WHEN s.sm >= 0
       |              THEN (2 * CAST(s.sm * 1000000 AS HUGEINT) + s.nn) // (2 * s.nn)
       |              ELSE -((2 * CAST(-(s.sm * 1000000) AS HUGEINT) + s.nn) // (2 * s.nn))
       |              END AS DOUBLE) / 1000000.0
       |       END AS mean FROM
       |  (SELECT COUNT(*) AS n_rows, COUNT(*) - COUNT($valExpr) AS n_null,
       |          COUNT($valExpr) AS nn,
       |          MIN(CAST($statExpr AS DOUBLE)) AS "min",
       |          MAX(CAST($statExpr AS DOUBLE)) AS "max",
       |          SUM(CAST($statExpr AS DECIMAL(38,6))) AS sm
       |   FROM $from) s CROSS JOIN
       |  (WITH hh AS (SELECT DISTINCT
       |       ('0x' || substr(md5(CAST($valExpr AS VARCHAR)), 1, 15))::BIGINT AS h
       |     FROM $from WHERE $valExpr IS NOT NULL),
       |   rk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hh),
       |   a AS (SELECT COUNT(*) AS nd, MAX(CASE WHEN rn <= 64 THEN h END) AS kth FROM rk)
       |   SELECT CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
       |               ELSE round(63.0 * (pow(2.0, 60.0) / CAST(GREATEST(kth, 1) AS DOUBLE)), 4)
       |          END AS n_distinct FROM a) d""".stripMargin


  /** q_profile_drift: the two snapshot profiles replayed column by
    * column (the [[profileColOracle]] battery over the filtered/
    * damaged subqueries), joined, with the delta/flag arithmetic run
    * on the same already-rounded fields the operator uses. */
  private lazy val profileDriftOracleSql: String = {
    val beforeFrom =
      """(SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |        o_custkey, o_orderpriority
        | FROM orders WHERE o_orderkey % 2 = 0)""".stripMargin
    val afterFrom =
      """(SELECT CASE WHEN o_orderkey % 10 = 3 THEN NULL
        |             ELSE CAST(o_totalprice AS DECIMAL(18,2)) +
        |                  CASE WHEN o_orderkey % 4 = 1 THEN 60000 ELSE 0 END
        |        END AS price,
        |        o_custkey, o_orderpriority
        | FROM orders WHERE o_orderkey % 2 = 1)""".stripMargin
    def sideSql(from: String): String = Seq(
      profileColOracle("price", "price", "price", from),
      profileColOracle("o_custkey", "o_custkey", "o_custkey", from),
      profileColOracle("o_orderpriority", "o_orderpriority", "len(o_orderpriority)", from)
    ).mkString("\nUNION ALL\n")
    s"""WITH pa AS MATERIALIZED (${sideSql(beforeFrom)}),
       |pb AS MATERIALIZED (${sideSql(afterFrom)}),
       |j AS (SELECT pa."column",
       |        pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
       |        ROUND(CAST(pa.n_null AS DOUBLE) / GREATEST(pa.n_rows, 1), 6) AS null_rate_a,
       |        ROUND(CAST(pb.n_null AS DOUBLE) / GREATEST(pb.n_rows, 1), 6) AS null_rate_b,
       |        pa.mean AS mean_a, pb.mean AS mean_b
       |      FROM pa JOIN pb ON pb."column" = pa."column"),
       |d AS (SELECT *,
       |        CASE WHEN mean_a IS NOT NULL AND mean_b IS NOT NULL AND mean_a <> 0
       |             THEN ROUND(ABS(mean_b - mean_a) / ABS(mean_a), 6) END AS mean_rel_delta
       |      FROM j)
       |SELECT "column", n_rows_a, n_rows_b, null_rate_a, null_rate_b,
       |  mean_a, mean_b, mean_rel_delta,
       |  CAST(CASE WHEN ABS(null_rate_b - null_rate_a) > 0.01
       |              OR COALESCE(mean_rel_delta > 0.05, FALSE)
       |       THEN 1 ELSE 0 END AS INTEGER) AS drift_flag
       |FROM d""".stripMargin
  }

  private lazy val profileOracleSql: String = Seq(
    profileColOracle("l_orderkey", "l_orderkey", "l_orderkey"),
    profileColOracle("quantity",
      "CAST(l_quantity AS DECIMAL(18,2))", "CAST(l_quantity AS DECIMAL(18,2))"),
    profileColOracle("price",
      "CAST(l_extendedprice AS DECIMAL(18,2))", "CAST(l_extendedprice AS DECIMAL(18,2))"),
    profileColOracle("discount",
      "CAST(l_discount AS DECIMAL(18,2))", "CAST(l_discount AS DECIMAL(18,2))"),
    profileColOracle("l_returnflag", "l_returnflag", "len(l_returnflag)"),
    profileColOracle("l_linestatus", "l_linestatus", "len(l_linestatus)")
  ).mkString("\nUNION ALL\n")

  /** q_triangles: the degree-ordered wedge enumeration replayed
    * literally — canonical undirected edges, (degree, id)-orientation,
    * wedge pairs at the min-rank vertex closed against the edge set. */
  /** q_kcore: the peel unrolled — per round, edges induced by the
    * previous alive set, then the degree >= k filter; the final
    * degree rollup runs over the round-8 induced edges. */
  private lazy val kcoreOracleSql: String = {
    val rounds = 8
    val iters = (2 to rounds).map { i =>
      s"""e$i AS (SELECT und.a, und.b FROM und
         |  JOIN a${i - 1} x ON x.node = und.a JOIN a${i - 1} y ON y.node = und.b),
         |a$i AS MATERIALIZED (SELECT node FROM (
         |  SELECT a AS node FROM e$i UNION ALL SELECT b AS node FROM e$i) t
         | GROUP BY node HAVING COUNT(*) >= 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id % 25 AS g, doc_id % 6 AS r FROM documents),
       |raw AS (SELECT
       |  'g' || CAST(g AS VARCHAR) || CASE r WHEN 0 THEN ':t1' WHEN 1 THEN ':t2'
       |    WHEN 2 THEN ':t1' WHEN 3 THEN ':t3' WHEN 4 THEN ':p1' ELSE ':p2' END AS s,
       |  'g' || CAST(g AS VARCHAR) || CASE r WHEN 0 THEN ':t2' WHEN 1 THEN ':t3'
       |    WHEN 2 THEN ':t3' WHEN 3 THEN ':p1' WHEN 4 THEN ':p2' ELSE ':p3' END AS t
       |  FROM d),
       |und AS MATERIALIZED (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b FROM raw WHERE s <> t),
       |a1 AS MATERIALIZED (SELECT node FROM (
       |  SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) t0
       | GROUP BY node HAVING COUNT(*) >= 2),
       |$iters,
       |ef AS (SELECT und.a, und.b FROM und
       |  JOIN a$rounds x ON x.node = und.a JOIN a$rounds y ON y.node = und.b)
       |SELECT node, COUNT(*) AS core_degree FROM (
       |  SELECT a AS node FROM ef UNION ALL SELECT b AS node FROM ef) t1
       |GROUP BY node""".stripMargin
  }

  private lazy val trianglesOracleSql: String =
    s"""WITH $linkGraphEdgesCtes,
       |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |        FROM edges WHERE src <> dst),
       |deg AS (SELECT v, COUNT(*) AS d FROM (
       |  SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
       |o AS (SELECT
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b) THEN u.a ELSE u.b END AS lo,
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b) THEN u.b ELSE u.a END AS hi
       |  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
       |w AS (SELECT o1.lo AS c, o1.hi AS x, o2.hi AS y
       |      FROM o o1 JOIN o o2 ON o1.lo = o2.lo AND o1.hi < o2.hi),
       |t AS (SELECT c, x, y FROM w JOIN und e ON e.a = w.x AND e.b = w.y),
       |pn AS (SELECT v, COUNT(*) AS nt FROM (
       |  SELECT c AS v FROM t UNION ALL SELECT x AS v FROM t
       |  UNION ALL SELECT y AS v FROM t) GROUP BY v)
       |SELECT deg.v AS node, deg.d AS degree, COALESCE(pn.nt, 0) AS n_triangles,
       |  ROUND(CASE WHEN deg.d >= 2
       |             THEN 2.0 * COALESCE(pn.nt, 0) / (deg.d * (deg.d - 1.0))
       |             ELSE 0.0 END, 6) AS lcc
       |FROM deg LEFT JOIN pn ON pn.v = deg.v""".stripMargin

  private lazy val topNgramsOracleSql: String =
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT source, array_to_string(t[i + 1 : i + 3], ' ') AS ngram
      |      FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
      |c AS (SELECT source, ngram, COUNT(*) AS n_occurrences FROM g GROUP BY source, ngram),
      |r AS (SELECT source, ngram, n_occurrences,
      |        row_number() OVER (PARTITION BY source ORDER BY n_occurrences DESC, ngram ASC) AS rank
      |      FROM c)
      |SELECT source, ngram, n_occurrences, rank FROM r WHERE rank <= 10""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared CTE constructing the expected CANONICAL url per doc —
    * direct arithmetic, the normalizer never runs on the oracle side. */
  private val urlCanonCte: String =
    """c AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN 'www.example.com'
      |        WHEN doc_id % 3 = 1 THEN 'news.example.com'
      |        ELSE 'blog.other.org' END) ||
      |  '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 5 IN (0, 1, 2) THEN '?a=1&b=2' ELSE '' END) AS url_norm,
      |  (CASE WHEN doc_id % 3 IN (0, 1) THEN 'example.com' ELSE 'other.org' END) AS domain
      |FROM documents)""".stripMargin

  /** Shared dHash-recompute CTE chain for the paired image fixture —
    * pure arithmetic (BT.601 integer luma, floor box-means, gradient
    * bits packed into unsigned 32-bit halves); no decoder runs here. */
  /** Shared fixture-geometry CTEs for the image-hash oracles. */
  private val imageDimsCtes: String =
    """ids AS (SELECT unnest(generate_series(0, 59)) AS img_id),
      |meta AS (SELECT img_id, img_id % 30 AS b, img_id >= 30 AS pert FROM ids),
      |dims AS (SELECT img_id, b, pert, 18 + b % 5 AS w, 16 + b % 3 AS h FROM meta)""".stripMargin

  private val dhashCtes: String =
    s"""$imageDimsCtes,
      |px AS (SELECT img_id, b, pert, w, h, ux.x AS x, uy.y AS y
      |       FROM dims, unnest(generate_series(0, w - 1)) AS ux(x),
      |                  unnest(generate_series(0, h - 1)) AS uy(y)),
      |g AS (SELECT img_id, x * 9 // w AS ox, y * 8 // h AS oy,
      |        (299 * (CASE WHEN pert AND x = 0 AND y = 0
      |                     THEN ((b * 31 + x * 7 + y * 13) % 256 + 1) % 256
      |                     ELSE (b * 31 + x * 7 + y * 13) % 256 END)
      |         + 587 * ((b * 17 + x * 3 + y * 11) % 256)
      |         + 114 * ((b * 23 + x * 5 + y * 19) % 256)) // 1000 AS gray
      |      FROM px),
      |g9 AS (SELECT img_id, ox, oy, SUM(gray) // COUNT(*) AS gv FROM g GROUP BY 1, 2, 3),
      |bits AS (SELECT l.img_id, l.oy * 8 + l.ox AS idx,
      |           CASE WHEN r.gv > l.gv THEN 1 ELSE 0 END AS bit
      |         FROM g9 l JOIN g9 r ON r.img_id = l.img_id AND r.oy = l.oy AND r.ox = l.ox + 1
      |         WHERE l.ox < 8),
      |hs AS (SELECT img_id,
      |         CAST(SUM(CASE WHEN idx >= 32 THEN CAST(bit AS BIGINT) << (idx - 32) ELSE 0 END) AS BIGINT) AS dhash_hi,
      |         CAST(SUM(CASE WHEN idx < 32 THEN CAST(bit AS BIGINT) << idx ELSE 0 END) AS BIGINT) AS dhash_lo
      |       FROM bits GROUP BY img_id)""".stripMargin

  /** q_image_phash: the fixed-point DCT hash replayed — nearest-sample
    * 32×32 gray grid from the fixture formula, the SAME 10⁶-scaled
    * integer cosine table as [[graft.ops.Multimodal.phashCosQ]] (a
    * VALUES literal), HUGEINT coefficient sums, and the 63·C vs Σ(≠DC)
    * integer cross-multiply — no float anywhere on either engine. */
  private lazy val imagePhashOracleSql: String = {
    val cm = graft.ops.Multimodal.phashCosQ.zipWithIndex.map { case (c, i) =>
      s"(${i / 8}, ${i % 8}, $c)"
    }.mkString(", ")
    s"""WITH $imageDimsCtes,
       |cm AS (SELECT * FROM (VALUES $cm) AS v(i, u, c)),
       |g32 AS (SELECT img_id, ox, oy,
       |          (299 * (CASE WHEN pert AND x = 0 AND y = 0
       |                       THEN ((b * 31 + x * 7 + y * 13) % 256 + 1) % 256
       |                       ELSE (b * 31 + x * 7 + y * 13) % 256 END)
       |           + 587 * ((b * 17 + x * 3 + y * 11) % 256)
       |           + 114 * ((b * 23 + x * 5 + y * 19) % 256)) // 1000 AS gray
       |        FROM (SELECT img_id, b, pert, uox.o AS ox, uoy.o AS oy,
       |                uox.o * w // 32 AS x, uoy.o * h // 32 AS y
       |              FROM dims, unnest(generate_series(0, 31)) AS uox(o),
       |                         unnest(generate_series(0, 31)) AS uoy(o)) t),
       |co AS (SELECT img_id, cu.u AS u, cv.u AS v,
       |        SUM(CAST(gray AS HUGEINT) * cu.c * cv.c) AS c
       |      FROM g32 JOIN cm cu ON cu.i = ox JOIN cm cv ON cv.i = oy
       |      GROUP BY 1, 2, 3),
       |se AS (SELECT img_id,
       |        SUM(c) - SUM(CASE WHEN u = 0 AND v = 0 THEN c ELSE 0 END) AS sx
       |      FROM co GROUP BY img_id),
       |pbits AS (SELECT co.img_id, v * 8 + u AS idx,
       |          CASE WHEN c * 63 > se.sx THEN 1 ELSE 0 END AS bit
       |        FROM co JOIN se USING (img_id)),
       |ph AS (SELECT img_id,
       |         CAST(SUM(CASE WHEN idx >= 32 THEN CAST(bit AS BIGINT) << (idx - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
       |         CAST(SUM(CASE WHEN idx < 32 THEN CAST(bit AS BIGINT) << idx ELSE 0 END) AS BIGINT) AS phash_lo
       |       FROM pbits GROUP BY img_id)
       |SELECT CAST(img_id AS BIGINT) AS img_id, phash_hi, phash_lo FROM ph""".stripMargin
  }

  /** Shared winnowing-recompute CTE chain (gram poly-hashes + window
    * argmin with the rightmost-tie rule) — q_winnow / q_winnow_pairs. */
  private val winnowCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, i, array_to_string(t[i + 1 : i + 3], ' ') AS gram
      |      FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
      |h AS (SELECT doc_id, i,
      |        list_reduce(
      |          list_prepend(0::BIGINT, list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
      |          (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      |      FROM g),
      |n AS (SELECT doc_id, MAX(i) + 1 AS ng FROM h GROUP BY doc_id),
      |st AS (SELECT doc_id, unnest(generate_series(0, ng - 4)) AS i0 FROM n),
      |wins AS (SELECT h.doc_id, st.i0, h.i, h.fp
      |         FROM st JOIN h ON h.doc_id = st.doc_id AND h.i BETWEEN st.i0 AND st.i0 + 3),
      |sel AS (SELECT doc_id, i0, i, fp,
      |          row_number() OVER (PARTITION BY doc_id, i0 ORDER BY fp ASC, i DESC) AS rn
      |        FROM wins)""".stripMargin

  /** Distinct typo-domain universe ([[typoDomain]] respelled): the
    * shared base of the q_fuzzy_* oracles. */
  private lazy val typoDomainCte: String =
    // `||` never starts a line: this CTE is interpolated into callers
    // that stripMargin AGAIN, which would eat the first pipe
    """dom AS (
      |  SELECT DISTINCT CASE WHEN doc_id % 7 = 0
      |    THEN substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 3) ||
      |      substr(md5(CAST(doc_id % 50 AS VARCHAR)), 5, 4) || '.example.com'
      |    ELSE substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 8) || '.example.com' END AS s
      |  FROM documents)""".stripMargin

  /** Shared CTE chain recomputing the CDC chunking (w = 2, modulus 16)
    * from raw text: gram poly-hash (the winnow spelling), cut
    * positions, cumulative boundary count, chunk reassembly. The
    * kernel never runs on the oracle side. */
  private lazy val cdcChunksCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |cfp AS (SELECT doc_id, i, len(t) AS nt,
      |         list_reduce(
      |           list_prepend(0::BIGINT, list_transform(
      |             string_split(array_to_string(t[i + 1 : i + 2], ' '), ''),
      |             c -> ascii(c)::BIGINT)),
      |           (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      |       FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)),
      |cuts AS (SELECT doc_id, i + 2 AS b FROM cfp WHERE fp % 16 = 0 AND i + 2 < nt),
      |cpos AS (SELECT doc_id, i AS pos, t[i + 1] AS tok
      |        FROM toks, unnest(generate_series(0, len(t) - 1)) AS u(i)),
      |cid AS (SELECT p.doc_id, p.pos, p.tok,
      |               SUM(CASE WHEN c.b IS NOT NULL THEN 1 ELSE 0 END)
      |                 OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS chunk_idx
      |        FROM cpos p LEFT JOIN cuts c ON c.doc_id = p.doc_id AND c.b = p.pos),
      |chunks AS (SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |                  string_agg(tok, ' ' ORDER BY pos) AS chunk
      |           FROM cid GROUP BY doc_id, chunk_idx)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_cdc_chunks" ->
      s"""WITH $cdcChunksCtes
         |SELECT doc_id, chunk_idx, chunk FROM chunks""".stripMargin,
    "q_cdc_dedup" ->
      s"""WITH $cdcChunksCtes,
         |occ AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY chunk),
         |per AS (SELECT c.doc_id, COUNT(*) AS n_chunks,
         |               CAST(SUM(CASE WHEN o.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
         |        FROM chunks c JOIN occ o ON o.chunk = c.chunk GROUP BY c.doc_id)
         |SELECT doc_id, n_chunks, n_dup_chunks,
         |       round(CAST(n_dup_chunks AS DOUBLE) / n_chunks, 4) AS dup_frac
         |FROM per""".stripMargin,
    "q_zorder" -> {
      val z = graft.ops.ZOrder.interleaveSql(
        Seq("e.user_id", "e.ts_us"), Seq("b.mn0", "b.mn1"), Seq("b.mx0", "b.mx1"), 16)
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |b AS (SELECT MIN(user_id) AS mn0, MAX(user_id) AS mx0,
         |             MIN(ts_us) AS mn1, MAX(ts_us) AS mx1 FROM e),
         |zt AS (SELECT ($z) AS z FROM e, b)
         |SELECT z >> 24 AS z_bucket, COUNT(*) AS n,
         |       MIN(z) AS z_min, MAX(z) AS z_max
         |FROM zt GROUP BY 1""".stripMargin
    },
    // n_deflate values are a GOLDEN LITERAL table per doc_id residue —
    // precomputed by CPython zlib (raw, level 6) in
    // tools/gen_deflate_goldens.py; byte counts and ratio arithmetic
    // recomputed SQL-side. DuckDB strlen = byte length.
    "q_compress_ratio" ->
      """WITH g(r, nd) AS (VALUES (0, 50), (1, 79), (2, 82), (3, 81), (4, 79),
        |                         (5, 79), (6, 79), (7, 79), (8, 79), (9, 75)),
        |u AS (SELECT doc_id, CAST(doc_id % 10 AS INT) AS r,
        |        repeat(md5(CAST(doc_id % 10 AS VARCHAR)), CAST(doc_id % 10 AS INT))
        |          || repeat('the quick brown fox jumps over the lazy dog ', 10 - CAST(doc_id % 10 AS INT)) AS text
        |      FROM documents)
        |SELECT u.doc_id,
        |  CAST(strlen(u.text) AS BIGINT) AS n_bytes,
        |  CAST(g.nd AS BIGINT) AS n_deflate,
        |  round(CAST(g.nd AS DOUBLE) / GREATEST(strlen(u.text), 1), 4) AS compress_ratio
        |FROM u JOIN g ON g.r = u.r""".stripMargin,
    "q_fuzzy_join" ->
      s"""WITH $typoDomainCte
         |SELECT a.s AS domain_a, b.s AS domain_b,
         |       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
         |FROM dom a JOIN dom b ON a.s < b.s
         |WHERE levenshtein(a.s, b.s) <= 1""".stripMargin,
    "q_link_authority" -> linkAuthorityOracleSql,
    "q_hits" -> hitsOracleSql,
    "q_label_prop" -> labelPropOracleSql,
    "q_modularity" -> modularityOracleSql,
    "q_triangles" -> trianglesOracleSql,
    "q_kcore" -> kcoreOracleSql,
    "q_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id % 500 AS src, ((doc_id % 500) * 2 + 1) % 500 AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id % 500, ((doc_id % 500) + 7) % 500 FROM documents) t),
        |s AS (SELECT DISTINCT doc_id % 500 AS node FROM documents
        |      WHERE doc_id % 500 IN (0, 250)),
        |r AS (
        |  SELECT node, 0 AS dist FROM s
        |  UNION
        |  SELECT e.dst AS node, r.dist + 1 AS dist
        |  FROM r JOIN e ON e.src = r.node WHERE r.dist < 6)
        |SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM r GROUP BY 1""".stripMargin,
    "q_trailing_features" ->
      """WITH w0 AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    COUNT(CAST(value AS DECIMAL(18,2))) OVER w AS n_prior,
        |    SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sum_prior
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |               RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, n_prior,
        |  CAST(sum_prior AS DOUBLE) AS sum_prior,
        |  CASE WHEN n_prior > 0
        |       THEN ROUND(CAST(sum_prior AS DOUBLE) / n_prior, 6) END AS mean_prior
        |FROM w0""".stripMargin,
    "q_k_anon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS bal_band,
        |  COUNT(*) AS n,
        |  CAST(COUNT(*) < 5 AS INTEGER) AS k_violation
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,
    "q_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS n_sensitive,
        |  CAST(COUNT(DISTINCT bal_band) < 8 AS INTEGER) AS l_violation
        |FROM (SELECT c_nationkey, c_mktsegment,
        |        CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS bal_band
        |      FROM customer) t
        |GROUP BY 1, 2""".stripMargin,
    "q_t_closeness" ->
      """WITH base AS (SELECT c_nationkey, c_mktsegment,
        |        CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS v FROM customer),
        |cv AS (SELECT c_nationkey, c_mktsegment, v, COUNT(*) AS c FROM base GROUP BY 1, 2, 3),
        |g AS (SELECT v, CAST(SUM(c) AS BIGINT) AS gc FROM cv GROUP BY v),
        |gcum AS (SELECT v, SUM(gc) OVER (ORDER BY v) AS cum_g FROM g),
        |tot AS (SELECT CAST(SUM(gc) AS BIGINT) AS nn,
        |               CAST(COUNT(*) AS BIGINT) AS m FROM g),
        |cls AS (SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS n
        |        FROM cv GROUP BY 1, 2),
        |grid AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.n, g.v FROM cls CROSS JOIN g),
        |j AS (SELECT grid.c_nationkey, grid.c_mktsegment, grid.n, grid.v,
        |        COALESCE(cv.c, 0) AS c
        |      FROM grid LEFT JOIN cv ON cv.c_nationkey = grid.c_nationkey
        |        AND cv.c_mktsegment = grid.c_mktsegment AND cv.v = grid.v),
        |cum AS (SELECT *, SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
        |          ORDER BY v) AS cum_c FROM j),
        |t AS (SELECT cum.c_nationkey, cum.c_mktsegment, cum.n,
        |        abs(CAST(cum_c AS HUGEINT) * nn - CAST(gcum.cum_g AS HUGEINT) * n) AS dt
        |      FROM cum JOIN gcum ON gcum.v = cum.v CROSS JOIN tot),
        |agg AS (SELECT c_nationkey, c_mktsegment, n, SUM(dt) AS d FROM t GROUP BY 1, 2, 3)
        |SELECT a.c_nationkey, a.c_mktsegment, a.n,
        |  round(CAST(d AS DOUBLE)
        |        / CAST(n * nn * (CASE WHEN m > 1 THEN m - 1 ELSE 1 END) AS DOUBLE), 6) AS emd,
        |  CAST(d * 1000000 > CAST(n AS HUGEINT) * nn
        |         * (CASE WHEN m > 1 THEN m - 1 ELSE 1 END) * 150000 AS INT) AS t_violation
        |FROM agg a CROSS JOIN tot""".stripMargin,
    "q_ks_test" -> ksTestOracleSql,
    "q_mannwhitney" -> mannWhitneyOracleSql,
    "q_cuped" ->
      """WITH e AS (SELECT 'arm' || CAST(user_id % 3 AS VARCHAR) AS variant,
        |        CAST(value AS DECIMAL(18,2)) AS y,
        |        CAST(FLOOR(value / 10) * 10 AS DECIMAL(18,2)) AS x FROM events),
        |a AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy, SUM(x) AS sx,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM e GROUP BY 1),
        |p AS (SELECT *, SUM(n) OVER () AS nn, SUM(sy) OVER () AS syt, SUM(sx) OVER () AS sxt,
        |        SUM(sxy) OVER () AS sxyt, SUM(sxx) OVER () AS sxxt, SUM(syy) OVER () AS syyt
        |      FROM a),
        |q AS (SELECT variant, n, sy, sx,
        |        CAST(sxyt AS DOUBLE) - CAST(sxt AS DOUBLE) * CAST(syt AS DOUBLE) / CAST(nn AS DOUBLE) AS cov,
        |        CAST(sxxt AS DOUBLE) - CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE) / CAST(nn AS DOUBLE) AS vx,
        |        CAST(syyt AS DOUBLE) - CAST(syt AS DOUBLE) * CAST(syt AS DOUBLE) / CAST(nn AS DOUBLE) AS vy,
        |        CAST(sxt AS DOUBLE) / CAST(nn AS DOUBLE) AS mx
        |      FROM p)
        |SELECT variant, n,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
        |  round(CASE WHEN vx > 0
        |        THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |             - (cov / vx) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - mx)
        |        ELSE CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) END, 6) AS mean_adj,
        |  round(CASE WHEN vx > 0 THEN cov / vx END, 6) AS theta,
        |  round(CASE WHEN vx > 0 AND vy > 0 THEN cov * cov / (vx * vy) END, 6) AS rho2
        |FROM q""".stripMargin,
    "q_ab_test" ->
      """WITH ev AS (SELECT 'arm' || (user_id % 3) AS variant,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted
        |  FROM events),
        |arms AS (SELECT variant, COUNT(*) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS conv FROM ev GROUP BY 1),
        |ctl AS (SELECT n AS n_c, conv AS conv_c FROM arms WHERE variant = 'arm0'),
        |x AS (SELECT variant, n, conv, n_c,
        |    CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
        |    CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS p2,
        |    CAST(conv + conv_c AS DOUBLE) / CAST(n + n_c AS DOUBLE) AS pp
        |  FROM arms CROSS JOIN ctl),
        |y AS (SELECT variant, n, conv, n_c, p1, p2,
        |    sqrt(pp * (1.0 - pp) *
        |         (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE))) AS se
        |  FROM x),
        |z0 AS (SELECT variant, n, conv, ROUND(p1, 6) AS rate,
        |    CASE WHEN variant <> 'arm0' AND n > 0 AND n_c > 0 AND se > 0
        |         THEN ROUND((p1 - p2) / se, 6) END AS z
        |  FROM y)
        |SELECT variant, n, conv, rate, z,
        |  CAST(COALESCE(ABS(z) >= 1.96, FALSE) AS INTEGER) AS significant
        |FROM z0""".stripMargin,
    "q_acf" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT user_id,
        |    ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean
        |  FROM v GROUP BY 1),
        |d AS (SELECT v.user_id, ts_us, CAST(v AS DOUBLE) - mean AS dev
        |      FROM v JOIN m ON m.user_id = v.user_id),
        |l AS (SELECT user_id, dev,
        |    lead(dev, 1) OVER w AS d1, lead(dev, 2) OVER w AS d2,
        |    lead(dev, 3) OVER w AS d3
        |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |r AS (SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(round(dev * dev, 12) AS DECIMAL(38,12))) AS den,
        |    COUNT(d1) AS np1, COUNT(d2) AS np2, COUNT(d3) AS np3,
        |    SUM(CASE WHEN d1 IS NOT NULL
        |        THEN CAST(round(dev * d1, 12) AS DECIMAL(38,12)) END) AS nm1,
        |    SUM(CASE WHEN d2 IS NOT NULL
        |        THEN CAST(round(dev * d2, 12) AS DECIMAL(38,12)) END) AS nm2,
        |    SUM(CASE WHEN d3 IS NOT NULL
        |        THEN CAST(round(dev * d3, 12) AS DECIMAL(38,12)) END) AS nm3
        |  FROM l GROUP BY 1)
        |SELECT user_id, n, lag, n_pairs,
        |  CASE WHEN n_pairs > 0 AND den <> 0
        |       THEN ROUND(CAST(nm AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |FROM (
        |  SELECT user_id, n, 1 AS lag, np1 AS n_pairs, nm1 AS nm, den FROM r
        |  UNION ALL SELECT user_id, n, 2, np2, nm2, den FROM r
        |  UNION ALL SELECT user_id, n, 3, np3, nm3, den FROM r) t""".stripMargin,
    "q_twap" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |seg AS (SELECT user_id, ts_us AS s, v,
        |    LEAST(
        |      COALESCE(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us),
        |               ts_us - ts_us % 3600000000 + 3600000000),
        |      ts_us + 7200000000) AS e
        |  FROM v),
        |ex AS (SELECT user_id, s, e, v,
        |    unnest(range((s - s % 3600000000) // 3600000000,
        |                 ((e - 1) - (e - 1) % 3600000000) // 3600000000 + 1)) AS b
        |  FROM seg WHERE e > s),
        |du AS (SELECT user_id, b, v,
        |    LEAST(e, (b + 1) * 3600000000) - GREATEST(s, b * 3600000000) AS dur
        |  FROM ex)
        |SELECT user_id, b * 3600000000 AS bucket_start,
        |  COUNT(*) AS n_segments, CAST(SUM(dur) AS BIGINT) AS dur_us,
        |  ROUND(CAST(SUM(v * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6) AS twap
        |FROM du GROUP BY 1, 2""".stripMargin,
    "q_target_encode" ->
      """WITH st AS (SELECT o_orderpriority AS cat,
        |    COUNT(CAST(o_totalprice AS DECIMAL(18,2))) AS n_cat,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sm
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority, st.n_cat,
        |  CASE WHEN o_totalprice IS NOT NULL AND st.n_cat > 1
        |       THEN ROUND(CAST(sm - CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |                  / (st.n_cat - 1), 6) END AS loo_mean
        |FROM orders JOIN st ON st.cat = orders.o_orderpriority""".stripMargin,
    "q_mojibake" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE 0 END AS INTEGER) AS n_mojibake,
        |  CAST(CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS INTEGER) AS n_replacement,
        |  CAST(CASE doc_id % 4 WHEN 3 THEN 0 ELSE 1 END AS INTEGER) AS encoding_suspect
        |FROM documents""".stripMargin,
    "q_profile" -> profileOracleSql,
    "q_profile_drift" -> profileDriftOracleSql,
    "q_quantiles" -> quantilesOracleSql,
    "q_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS touch_event
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |j AS (SELECT p.event_id, p.user_id, p.ts_us, c.touch_event, c.ts_us AS touch_ts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN touch_ts >= ts_us - 3600000000 THEN touch_event END AS touch_event,
        |  CASE WHEN touch_ts >= ts_us - 3600000000 THEN ts_us - touch_ts END AS latency_us
        |FROM j""".stripMargin,
    "q_changelog_compact" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_us, event_type, value
        |FROM v WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_scd2" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS nxt
        |  FROM events)
        |SELECT user_id, ts_us, value, ts_us AS valid_from, nxt AS valid_to,
        |  nxt IS NULL AS is_current
        |FROM v""".stripMargin,
    "q_setsim_join" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN j = doc_id % 12
        |      THEN 's' || ((doc_id % 97) * 100 + 50 + j)
        |      ELSE 's' || ((doc_id % 97) * 100 + j) END AS tok
        |  FROM documents, (SELECT unnest(range(0, 12)) AS j) u),
        |sizes AS (SELECT doc_id, COUNT(*) AS m FROM toks GROUP BY 1),
        |co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |       FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.m + sb.m - inter AS uni
        |FROM co JOIN sizes sa ON sa.doc_id = co.id_a
        |        JOIN sizes sb ON sb.doc_id = co.id_b
        |WHERE inter * 10 >= (sa.m + sb.m - inter) * 7""".stripMargin,
    "q_resample" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |  CAST(value AS DECIMAL(18,2)) AS v FROM events)
        |SELECT user_id, ts_us - ts_us % 600000000 AS bucket_start, COUNT(*) AS n,
        |  CAST(arg_min(v, ts_us) AS DOUBLE) AS open,
        |  CAST(arg_max(v, ts_us) AS DOUBLE) AS close,
        |  CAST(MAX(v) AS DOUBLE) AS high, CAST(MIN(v) AS DOUBLE) AS low,
        |  CAST(SUM(v) AS DOUBLE) AS vsum,
        |  CAST(CASE WHEN SUM(v) >= 0
        |    THEN (2 * CAST(SUM(v) * 1000000 AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
        |    ELSE -((2 * CAST(-(SUM(v) * 1000000) AS HUGEINT) + COUNT(*)) // (2 * COUNT(*)))
        |  END AS DOUBLE) / 1000000.0 AS vmean
        |FROM v GROUP BY 1, 2""".stripMargin,
    "q_cocitation" ->
      """WITH e AS (
        |  SELECT DISTINCT 'p' || doc_id AS s, d FROM (
        |    SELECT doc_id, 'd' || (doc_id % 40) AS d FROM documents
        |    UNION ALL SELECT doc_id, 'd' || ((doc_id + 3) % 40) FROM documents
        |    UNION ALL SELECT doc_id, 'd' || ((doc_id * 2) % 40) FROM documents) t),
        |co AS (SELECT a.d AS dst_a, b.d AS dst_b, COUNT(*) AS n_common
        |       FROM e a JOIN e b ON a.s = b.s AND a.d < b.d
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT d, COUNT(*) AS dg FROM e GROUP BY 1)
        |SELECT dst_a, dst_b, n_common, da.dg AS deg_a, db.dg AS deg_b
        |FROM co JOIN deg da ON da.d = co.dst_a
        |        JOIN deg db ON db.d = co.dst_b""".stripMargin,
    "q_majority_vote" ->
      """WITH ann AS (
        |  SELECT vec_id AS item, 'r1' AS rater, 'l' || label AS label FROM embeddings
        |  UNION ALL SELECT vec_id, 'r2',
        |    'l' || (CASE WHEN vec_id % 5 = 0 THEN (label + 1) % 10 ELSE label END)
        |  FROM embeddings
        |  UNION ALL SELECT vec_id, 'r3',
        |    CASE WHEN vec_id % 7 = 0 THEN NULL ELSE 'l' || label END
        |  FROM embeddings),
        |v AS (SELECT item, label, COUNT(*) AS cnt FROM (
        |        SELECT DISTINCT item, rater, label FROM ann WHERE label IS NOT NULL) t
        |      GROUP BY 1, 2),
        |w AS (SELECT item, label, cnt,
        |        CAST(SUM(cnt) OVER (PARTITION BY item) AS BIGINT) AS nv,
        |        row_number() OVER (PARTITION BY item ORDER BY cnt DESC, label ASC) AS rn
        |      FROM v)
        |SELECT item, label, cnt AS n_agree, nv AS n_votes,
        |  CAST((2 * CAST(cnt AS HUGEINT) * 1000000 + nv) // (2 * nv) AS DOUBLE)
        |    / 1000000.0 AS agreement
        |FROM w WHERE rn = 1""".stripMargin,
    "q_kappa" ->
      """WITH p AS (SELECT 'l' || label AS a,
        |    CASE WHEN vec_id % 5 = 0 THEN 'l' || ((label + 1) % 10)
        |         ELSE 'l' || label END AS b
        |  FROM embeddings),
        |base AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree FROM p),
        |ma AS (SELECT a AS l, COUNT(*) AS ca FROM p GROUP BY 1),
        |mb AS (SELECT b AS l, COUNT(*) AS cb FROM p GROUP BY 1),
        |sm AS (SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS sum_marginal
        |       FROM ma JOIN mb USING (l))
        |SELECT n, n_agree, sum_marginal,
        |  CASE WHEN n * n - sum_marginal <> 0 THEN
        |    CASE WHEN n * n_agree - sum_marginal >= 0
        |      THEN CAST((2 * CAST(n * n_agree - sum_marginal AS HUGEINT) * 1000000
        |                 + (n * n - sum_marginal)) // (2 * (n * n - sum_marginal))
        |                AS DOUBLE) / 1000000.0
        |      ELSE -(CAST((2 * CAST(-(n * n_agree - sum_marginal) AS HUGEINT) * 1000000
        |                   + (n * n - sum_marginal)) // (2 * (n * n - sum_marginal))
        |                  AS DOUBLE) / 1000000.0)
        |    END END AS kappa
        |FROM base CROSS JOIN sm""".stripMargin,
    "q_conformal" ->
      """WITH sc AS (SELECT vec_id,
        |    CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) AS p,
        |    CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS y FROM embeddings),
        |cal AS (SELECT CASE WHEN y = 1 THEN CAST(1 AS DECIMAL(9,4)) - p ELSE p END AS s
        |        FROM sc WHERE vec_id % 2 = 0),
        |bv AS (SELECT s, COUNT(*) AS c FROM cal GROUP BY s),
        |rk AS (SELECT s, SUM(c) OVER (ORDER BY s) AS cum, SUM(c) OVER () AS n_calib FROM bv),
        |q AS (SELECT CAST(ANY_VALUE(n_calib) AS BIGINT) AS n_calib,
        |        COALESCE(MIN(CASE WHEN cum >= CEIL((n_calib + 1) * CAST(0.9000 AS DECIMAL(9,4)))
        |                          THEN s END),
        |                 CAST(1 AS DECIMAL(9,4))) AS qhat
        |      FROM rk),
        |t AS (SELECT p, y FROM sc WHERE vec_id % 2 = 1)
        |SELECT n_calib, CAST(qhat AS DOUBLE) AS qhat, COUNT(*) AS n_test,
        |  ROUND(CAST(SUM(CASE WHEN y = 1 THEN CAST(CAST(1 AS DECIMAL(9,4)) - p <= qhat AS INT)
        |                      ELSE CAST(p <= qhat AS INT) END) AS DOUBLE) / COUNT(*), 6) AS coverage,
        |  ROUND(CAST(SUM(CAST(p <= qhat AS INT)
        |                 + CAST(CAST(1 AS DECIMAL(9,4)) - p <= qhat AS INT)) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_set_size
        |FROM t CROSS JOIN q
        |GROUP BY n_calib, qhat""".stripMargin,
    "q_markov" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |p AS (SELECT event_type AS from_state,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_state,
        |        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS dt
        |      FROM e),
        |c AS (SELECT from_state, to_state, COUNT(*) AS n FROM p
        |      WHERE to_state IS NOT NULL AND dt < $UserGapUs GROUP BY 1, 2)
        |SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE), 6) AS prob
        |FROM c""".stripMargin,
    "q_fairness" ->
      """WITH s AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS type_token_ratio
        |FROM documents),
        |f AS (SELECT lang AS "group",
        |  CAST(n_tokens >= 20 AND n_tokens <= 80
        |       AND mean_word_len >= 4.0 AND mean_word_len <= 10.0
        |       AND stopword_ratio >= 0.02 AND type_token_ratio >= 0.35 AS INT) AS flag
        |FROM s),
        |g AS (SELECT "group", COUNT(*) AS n, CAST(SUM(flag) AS BIGINT) AS n_pos FROM f GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(n_pos) AS BIGINT) AS tp FROM g)
        |SELECT "group", n, n_pos,
        |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS gap,
        |  CASE WHEN tp > 0 THEN
        |    ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) END AS di_ratio
        |FROM g CROSS JOIN tot""".stripMargin,
    "q_reliability" ->
      """WITH sc AS (SELECT
        |    CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) AS s,
        |    CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM embeddings)
        |SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(s) AS DOUBLE) AS score_sum
        |FROM sc GROUP BY 1""".stripMargin,
    "q_class_report" ->
      """WITH pr AS (SELECT 'l' || label AS gold,
        |    'l' || (CASE WHEN vec_id % 5 = 0 THEN (label + 1) % 10 ELSE label END) AS pred
        |  FROM embeddings),
        |cm AS (SELECT gold, pred, COUNT(*) AS n FROM pr GROUP BY 1, 2),
        |cls AS (SELECT gold AS class FROM cm UNION SELECT pred FROM cm),
        |rt AS (SELECT gold AS class, CAST(SUM(n) AS BIGINT) AS rt FROM cm GROUP BY 1),
        |ct AS (SELECT pred AS class, CAST(SUM(n) AS BIGINT) AS ct FROM cm GROUP BY 1),
        |dg AS (SELECT gold AS class, n AS tp FROM cm WHERE gold = pred),
        |b AS (SELECT cls.class,
        |        COALESCE(dg.tp, 0) AS tp,
        |        COALESCE(ct.ct, 0) - COALESCE(dg.tp, 0) AS fp,
        |        COALESCE(rt.rt, 0) - COALESCE(dg.tp, 0) AS fn
        |      FROM cls LEFT JOIN rt USING (class) LEFT JOIN ct USING (class)
        |      LEFT JOIN dg USING (class))
        |SELECT class, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn,
        |  CASE WHEN tp + fp > 0
        |       THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
        |  CASE WHEN tp + fn > 0
        |       THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS recall,
        |  CASE WHEN tp * 2 + fp + fn > 0
        |       THEN ROUND(CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE), 6)
        |  END AS f1
        |FROM b""".stripMargin,
    "q_threshold" ->
      """WITH sc AS (SELECT
        |    CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) AS s,
        |    CASE WHEN (vec_id % 101) + (vec_id % 7) * 10 >= 80 THEN 1 ELSE 0 END AS label
        |  FROM embeddings),
        |ps AS (SELECT s, COUNT(*) AS n, SUM(label) AS p FROM sc GROUP BY 1),
        |cu AS (SELECT s, SUM(n) OVER w AS cn, SUM(p) OVER w AS cp, SUM(p) OVER () AS tp
        |       FROM ps
        |       WINDOW w AS (ORDER BY s DESC
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |q AS (SELECT * FROM cu WHERE cp * 1000000 >= 800000 * cn
        |      ORDER BY s ASC LIMIT 1)
        |SELECT CAST(s AS DOUBLE) AS threshold,
        |  CAST(cn AS BIGINT) AS n_kept, CAST(cp AS BIGINT) AS n_pos_kept,
        |  ROUND(CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE), 6) AS precision,
        |  CASE WHEN tp > 0 THEN ROUND(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6) END AS recall
        |FROM q""".stripMargin,
    "q_ece" ->
      """WITH sc AS (SELECT
        |    CAST(CAST(vec_id % 101 AS DECIMAL(9,4)) / 100 AS DECIMAL(9,4)) AS s,
        |    CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM embeddings),
        |b AS (SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin, COUNT(*) AS n,
        |        SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n_pos,
        |        SUM(s) AS score_sum
        |      FROM sc GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
        |        SUM(ABS(CAST(n_pos AS DECIMAL(38,4)) - score_sum)) AS d FROM b)
        |SELECT n, CAST((2 * CAST(d * 1000000 AS HUGEINT) + n) // (2 * n) AS DOUBLE)
        |  / 1000000.0 AS ece
        |FROM t""".stripMargin,
    "q_rater_accuracy" ->
      """WITH ann AS (
        |  SELECT vec_id AS item, 'r1' AS rater, 'l' || label AS label FROM embeddings
        |  UNION ALL SELECT vec_id, 'r2',
        |    'l' || (CASE WHEN vec_id % 5 = 0 THEN (label + 1) % 10 ELSE label END)
        |  FROM embeddings
        |  UNION ALL SELECT vec_id, 'r3',
        |    CASE WHEN vec_id % 7 = 0 THEN NULL ELSE 'l' || label END
        |  FROM embeddings),
        |dd AS (SELECT DISTINCT item, rater, label FROM ann WHERE label IS NOT NULL),
        |v AS (SELECT item, label, COUNT(*) AS cnt FROM dd GROUP BY 1, 2),
        |w AS (SELECT item, label,
        |        row_number() OVER (PARTITION BY item ORDER BY cnt DESC, label ASC) AS rn
        |      FROM v),
        |maj AS (SELECT item, label AS mj FROM w WHERE rn = 1)
        |SELECT rater, COUNT(*) AS n_items,
        |  CAST(SUM(CASE WHEN dd.label = maj.mj THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |  CAST((2 * CAST(SUM(CASE WHEN dd.label = maj.mj THEN 1 ELSE 0 END) AS HUGEINT)
        |        * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS accuracy
        |FROM dd JOIN maj USING (item) GROUP BY 1""".stripMargin,
    "q_keywords" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |toks AS (SELECT doc_id, t AS token FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t
        |    FROM documents) u WHERE t <> ''),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
        |         round(tf.tf * ln(1.0 + (SELECT n FROM nn) * 1.0 / dfx.df), 4) AS score
        |       FROM tf JOIN dfx USING (token)),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, token ASC) AS INT) AS rank
        |      FROM sc)
        |SELECT doc_id, token, tf, df, score, rank FROM r WHERE rank <= 5""".stripMargin,
    "q_token_drift" ->
      """WITH a AS (SELECT token, COUNT(*) AS ca FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |    FROM documents WHERE doc_id % 2 = 0) u WHERE token <> '' GROUP BY 1),
        |b0 AS (SELECT lower(text) ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' driftterm driftterm' ELSE '' END AS t
        |  FROM documents WHERE doc_id % 2 = 1),
        |b AS (SELECT token, COUNT(*) AS cb FROM (
        |    SELECT unnest(string_split_regex(t, '\s+')) AS token FROM b0) u
        |  WHERE token <> '' GROUP BY 1),
        |j AS (SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        |      FROM a FULL OUTER JOIN b ON a.token = b.token),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM j),
        |terms AS (SELECT
        |    CAST(round(
        |      CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / na)
        |             * ln((CAST(ca AS DOUBLE) / na)
        |                  / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0)) / 2.0
        |           ELSE 0.0 END +
        |      CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / nb)
        |             * ln((CAST(cb AS DOUBLE) / nb)
        |                  / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0)) / 2.0
        |           ELSE 0.0 END, 12) AS DECIMAL(38,12)) AS t
        |  FROM j CROSS JOIN tot)
        |SELECT (SELECT na FROM tot) AS n_tokens_a, (SELECT nb FROM tot) AS n_tokens_b,
        |  COUNT(*) AS n_vocab, round(CAST(SUM(t) AS DOUBLE), 6) AS js
        |FROM terms""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        |             o_orderstatus AS st FROM orders WHERE o_orderkey % 10 <> 0),
        |n AS (SELECT o_orderkey AS k,
        |        CAST(o_totalprice AS DECIMAL(18,2)) +
        |          CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS p,
        |        o_orderstatus AS st FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT COALESCE(o.k, n.k) AS o_orderkey,
        |  CAST(o.p AS DOUBLE) AS old_price, o.st AS old_status,
        |  CAST(n.p AS DOUBLE) AS new_price, n.st AS new_status,
        |  CASE WHEN o.k IS NULL THEN 'added'
        |       WHEN n.k IS NULL THEN 'removed'
        |       WHEN o.p = n.p AND o.st = n.st THEN 'unchanged'
        |       ELSE 'changed' END AS change
        |FROM o FULL OUTER JOIN n ON o.k = n.k""".stripMargin,
    "q_overlap_join" ->
      """WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS s,
        |             epoch_us(ts) + 14400000000 AS e FROM events
        |           WHERE event_type = 'purchase'),
        |b AS (SELECT user_id, event_id AS b_id, epoch_us(ts) AS s,
        |        epoch_us(ts) + 28800000000 AS e FROM events
        |      WHERE event_type = 'signup')
        |SELECT a.user_id, a_id, b_id,
        |  GREATEST(a.s, b.s) AS overlap_start, LEAST(a.e, b.e) AS overlap_stop
        |FROM a JOIN b ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e""".stripMargin,
    "q_quantile_bin" ->
      """WITH mm AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |              MAX(CAST(l_extendedprice AS DOUBLE)) AS mx,
        |              COUNT(CAST(l_extendedprice AS DOUBLE)) AS nn FROM lineitem),
        |cuts AS (
        |  SELECT mm.mn + qb.qb * (CASE WHEN mm.mx > mm.mn
        |           THEN (mm.mx - mm.mn) / 1000.0 ELSE 1.0 END) AS cut
        |  FROM (VALUES (0.25), (0.5), (0.75)) pp(prob) CROSS JOIN mm
        |  JOIN LATERAL (
        |    SELECT MIN(bucket) AS qb FROM (
        |      SELECT bucket, SUM(n) OVER (ORDER BY bucket) AS cum FROM (
        |        SELECT LEAST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mm.mn) /
        |                 (CASE WHEN mm.mx > mm.mn THEN (mm.mx - mm.mn) / 1000.0
        |                       ELSE 1.0 END)) AS INTEGER), 999) AS bucket,
        |               COUNT(*) AS n
        |        FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1))
        |    WHERE cum >= CEIL(CAST(pp.prob AS DOUBLE) * mm.nn)) qb ON TRUE)
        |SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS value,
        |  CAST((SELECT COUNT(*) FROM cuts
        |        WHERE cut <= CAST(l_extendedprice AS DOUBLE)) AS INTEGER) AS bin
        |FROM lineitem""".stripMargin,
    "q_split_leak" ->
      """WITH sp AS (SELECT source,
        |    CASE WHEN ('0x' || substr(md5('leak1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |              / 4294967296.0 < 0.8 THEN 'train' ELSE 'test' END AS split
        |  FROM documents),
        |per AS (SELECT source AS "group", split, COUNT(*) AS n FROM sp GROUP BY 1, 2)
        |SELECT "group", COUNT(*) AS n_splits,
        |  CAST(SUM(n) AS BIGINT) AS n_rows, CAST(MAX(n) AS BIGINT) AS n_majority
        |FROM per GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,
    "q_crawl_schedule" ->
      """WITH u AS (SELECT
        |    'http://site' || (doc_id % 20) || '.com/p' || doc_id AS url,
        |    'site' || (doc_id % 20) || '.com' AS host FROM documents),
        |r AS (SELECT url, host,
        |        CAST(row_number() OVER (PARTITION BY host ORDER BY url) AS INT) AS fetch_seq,
        |        ('0x' || substr(md5(host), 1, 8))::UBIGINT % 5000000 AS off
        |      FROM u)
        |SELECT url, host, fetch_seq,
        |  CAST(off + (fetch_seq - 1) * 5000000 AS BIGINT) AS fetch_at_us
        |FROM r""".stripMargin,
    "q_water_fill" ->
      """WITH ks AS (SELECT DISTINCT doc_id % 97 AS k FROM documents),
        |s AS (SELECT k, (k * k) % 101 + 1 AS demand FROM ks),
        |h AS (SELECT demand AS v, COUNT(*) AS c FROM s GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n FROM s),
        |w AS (SELECT v, c,
        |        SUM(v * c) OVER (ORDER BY v) - v * c AS fm_prev,
        |        SUM(c) OVER (ORDER BY v) - c AS kb_prev
        |      FROM h),
        |fl AS (SELECT (2000 - fm_prev) // (t.n - kb_prev) AS cand
        |       FROM w CROSS JOIN t
        |       WHERE fm_prev + v * (t.n - kb_prev) > 2000
        |       ORDER BY v LIMIT 1),
        |tau AS (SELECT COALESCE((SELECT cand FROM fl), (SELECT MAX(v) FROM h)) AS tv)
        |SELECT k, demand, CAST(LEAST(demand, tau.tv) AS BIGINT) AS alloc
        |FROM s CROSS JOIN tau""".stripMargin,
    "q_skew_advisor" ->
      """WITH c AS (SELECT l_suppkey AS key, COUNT(*) AS n
        |           FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |hot AS (SELECT key FROM c WHERE n >= 300),
        |r AS (SELECT hot.key, c1.n AS n_a, c2.n AS n_b,
        |        CAST(CAST(c1.n AS DECIMAL(19,0)) * CAST(c2.n AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS est_pairs
        |      FROM hot LEFT JOIN c c1 ON c1.key = hot.key LEFT JOIN c c2 ON c2.key = hot.key)
        |SELECT key, COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
        |  CAST(est_pairs AS BIGINT) AS est_pairs,
        |  CAST(GREATEST(1, (CAST(est_pairs AS HUGEINT) + 99999) // 100000) AS BIGINT) AS salt_factor
        |FROM r""".stripMargin,
    "q_winsorize" ->
      """WITH mm AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |    MAX(CAST(l_extendedprice AS DOUBLE)) AS mx,
        |    COUNT(CAST(l_extendedprice AS DOUBLE)) AS nn FROM lineitem),
        |par AS (SELECT mn, nn,
        |    CASE WHEN mx > mn THEN (mx - mn) / 1024 ELSE 1.0 END AS width FROM mm),
        |bk AS (SELECT LEAST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn) / width)
        |    AS INTEGER), 1023) AS bucket
        |  FROM lineitem, par WHERE l_extendedprice IS NOT NULL),
        |cnt AS (SELECT bucket, COUNT(*) AS n FROM bk GROUP BY 1),
        |cum AS (SELECT bucket, SUM(n) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM cnt),
        |qlo AS (SELECT MIN(bucket) AS qb FROM cum, par WHERE c >= CEIL(0.05 * nn)),
        |qhi AS (SELECT MIN(bucket) AS qb FROM cum, par WHERE c >= CEIL(0.95 * nn)),
        |cuts AS (SELECT mn + qlo.qb * width AS lo, mn + qhi.qb * width AS hi
        |         FROM par, qlo, qhi)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice AS DOUBLE) AS price,
        |  LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), lo), hi) AS price_w
        |FROM lineitem, cuts WHERE l_orderkey % 997 = 0""".stripMargin,
    "q_zipf" ->
      """WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |              FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS c FROM toks WHERE token <> '' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_vocab FROM cnt),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS r FROM cnt),
        |top AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        |        FROM rk WHERE r <= 1000),
        |s AS (SELECT COUNT(*) AS n,
        |    SUM(CAST(round(x, 12) AS DECIMAL(38,12))) AS sx,
        |    SUM(CAST(round(y, 12) AS DECIMAL(38,12))) AS sy,
        |    SUM(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS sxx,
        |    SUM(CAST(round(y * y, 12) AS DECIMAL(38,12))) AS syy
        |  FROM top),
        |e AS (SELECT n_tokens, n_vocab, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
        |  FROM s CROSS JOIN tot)
        |SELECT n_tokens, n_vocab, CAST(n AS BIGINT) AS top_n,
        |  CASE WHEN den <> 0 THEN ROUND(num / den, 6) END AS zipf_slope,
        |  CASE WHEN den * deny <> 0 THEN ROUND(num * num / (den * deny), 6) END AS r2
        |FROM e""".stripMargin,
    "q_compaction_plan" ->
      """WITH f AS (SELECT
        |    'part-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.parquet' AS file,
        |    (doc_id * 2654435761) % 10000000 + 1000 AS bytes
        |  FROM documents),
        |g AS (SELECT file, bytes,
        |    COALESCE(SUM(bytes) OVER (ORDER BY bytes DESC, file ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 16000000 AS grp
        |  FROM f)
        |SELECT file, CAST(bytes AS BIGINT) AS bytes, CAST(grp AS BIGINT) AS "group",
        |  CAST(SUM(bytes) OVER (PARTITION BY grp) AS BIGINT) AS group_bytes,
        |  COUNT(*) OVER (PARTITION BY grp) AS group_files
        |FROM g""".stripMargin,
    "q_item_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b,
        |    'p' || (l_partkey % 200) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT b, COUNT(*) AS s FROM it GROUP BY 1),
        |ok AS (SELECT it.b, it.i FROM it JOIN sz ON sz.b = it.b WHERE sz.s <= 20)
        |SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS n_baskets
        |FROM ok a JOIN ok c ON a.b = c.b AND a.i < c.i
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5""".stripMargin,
    "q_jaro_link" ->
      """WITH k AS (SELECT DISTINCT doc_id % 100 AS base,
        |    CASE doc_id % 3
        |      WHEN 0 THEN 'rec ' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0')
        |      WHEN 1 THEN 'rec ' || substr(lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0'), 1, 3) || 'x'
        |      ELSE 'rec ' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0') || 'z'
        |    END AS key
        |  FROM documents),
        |p AS (SELECT a.key AS key_a, b.key AS key_b,
        |        ROUND(jaro_winkler_similarity(a.key, b.key), 6) AS jw
        |      FROM k a JOIN k b ON a.base = b.base AND a.key < b.key)
        |SELECT key_a, key_b, jw FROM p WHERE jw >= 0.85""".stripMargin,
    "q_snm_dedup" ->
      """WITH k AS (SELECT doc_id,
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0') AS b,
        |    doc_id % 3 AS r FROM documents),
        |keys AS (SELECT doc_id,
        |    CASE r WHEN 0 THEN 'rec ' || b
        |           WHEN 1 THEN 'rec ' || substr(b, 1, 3) || 'x'
        |           ELSE 'rec ' || b || 'z' END AS key FROM k),
        |rk AS (SELECT doc_id, key,
        |         row_number() OVER (ORDER BY key, doc_id) AS rn FROM keys),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |             levenshtein(a.key, b.key) AS dist
        |      FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 4)
        |SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 2""".stripMargin,
    "q_readability" ->
      """WITH t AS (SELECT doc_id, text || '. The queue? Yes!' AS text FROM documents),
        |w AS (SELECT doc_id,
        |        GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS words
        |      FROM t),
        |s2 AS (SELECT doc_id,
        |         CAST(n_sent AS BIGINT) AS s,
        |         CAST(GREATEST(len(words), 1) AS BIGINT) AS w2,
        |         CAST(GREATEST(list_reduce(list_prepend(0::BIGINT, list_transform(words,
        |           x -> CAST(GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1) AS BIGINT))),
        |           (a, b) -> a + b), 1) AS BIGINT) AS sy
        |       FROM w),
        |n AS (SELECT doc_id, s, w2, sy,
        |        206835 * s * w2 - 1015 * w2 * w2 - 84600 * sy * s AS n1,
        |        390 * w2 * w2 + 11800 * sy * s - 15590 * s * w2 AS n2,
        |        s * w2 AS d FROM s2)
        |SELECT doc_id, w2 AS n_words, s AS n_sentences, sy AS n_syllables,
        |  CAST(CASE WHEN n1 < 0 THEN -((2 * (-n1) + d) // (2 * d))
        |            ELSE (2 * n1 + d) // (2 * d) END AS BIGINT) AS fre_milli,
        |  CAST(CASE WHEN n2 < 0 THEN -((2 * (-n2) + d) // (2 * d))
        |            ELSE (2 * n2 + d) // (2 * d) END AS BIGINT) AS fk_milli
        |FROM n""".stripMargin,
    "q_cms" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
        |b AS (SELECT u.i, item,
        |        (('0x' || substr(md5(item), 1, 15))::BIGINT
        |          // CAST(power(2, 5 * u.i) AS BIGINT)) % 32 AS bucket
        |      FROM toks, unnest(generate_series(0, 3)) AS u(i)),
        |sk AS (SELECT i, bucket, COUNT(*) AS c FROM b GROUP BY i, bucket),
        |cnt AS (SELECT item, COUNT(*) AS n_true FROM toks GROUP BY item),
        |probes AS (SELECT item, n_true FROM cnt ORDER BY n_true DESC, item ASC LIMIT 20),
        |pb AS (SELECT p.item, p.n_true, g.i,
        |        (('0x' || substr(md5(p.item), 1, 15))::BIGINT
        |          // CAST(power(2, 5 * g.i) AS BIGINT)) % 32 AS bucket
        |       FROM probes p, unnest(generate_series(0, 3)) AS g(i))
        |SELECT p.item, p.n_true, MIN(sk.c) AS n_est
        |FROM pb p JOIN sk ON sk.i = p.i AND sk.bucket = p.bucket
        |GROUP BY p.item, p.n_true""".stripMargin,
    "q_join_size" ->
      """WITH a AS (SELECT u.i,
        |    (('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |      // CAST(power(2, 12 * u.i) AS BIGINT)) % 4096 AS bucket,
        |    COUNT(*) AS ca
        |  FROM lineitem, unnest(generate_series(0, 3)) AS u(i)
        |  WHERE l_orderkey IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT u.i,
        |    (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |      // CAST(power(2, 12 * u.i) AS BIGINT)) % 4096 AS bucket,
        |    COUNT(*) AS cb
        |  FROM orders, unnest(generate_series(0, 3)) AS u(i)
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1, 2),
        |ip AS (SELECT a.i, CAST(SUM(a.ca * b.cb) AS BIGINT) AS ip
        |       FROM a JOIN b ON a.i = b.i AND a.bucket = b.bucket GROUP BY a.i)
        |SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ip""".stripMargin,
    "q_bloom_screen" ->
      """WITH sm AS (SELECT DISTINCT o_orderkey AS key FROM orders
        |            WHERE o_orderpriority = '1-URGENT'),
        |smp AS (SELECT ((('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT
        |          // CAST(power(2, 16 * u.i) AS BIGINT)) % 65536) AS p
        |        FROM sm, unnest(generate_series(0, 2)) AS u(i)),
        |words AS (SELECT p // 63 AS w,
        |            bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
        |          FROM smp GROUP BY 1),
        |bigk AS (SELECT l_orderkey AS key, COUNT(*) AS n_rows FROM lineitem
        |         WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |bp AS (SELECT key, n_rows,
        |         ((('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT
        |           // CAST(power(2, 16 * u.i) AS BIGINT)) % 65536) AS p
        |       FROM bigk, unnest(generate_series(0, 2)) AS u(i)),
        |hit AS (SELECT key, n_rows FROM bp
        |        JOIN words ON words.w = bp.p // 63
        |        WHERE (words.bits & (CAST(1 AS BIGINT) << CAST(bp.p % 63 AS INTEGER))) <> 0
        |        GROUP BY key, n_rows HAVING COUNT(*) = 3)
        |SELECT key AS l_orderkey, n_rows FROM hit""".stripMargin,
    "q_distinct_sketch" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT source, array_to_string(t[i + 1 : i + 3], ' ') AS g
        |      FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |h AS (SELECT DISTINCT source, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM g),
        |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |agg AS (SELECT source, COUNT(*) AS nd,
        |               MAX(CASE WHEN rn <= 64 THEN h END) AS kth
        |        FROM rk GROUP BY source)
        |SELECT source,
        |  CAST(LEAST(nd, 64) AS INTEGER) AS n_kmv,
        |  CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
        |       ELSE round(63.0 * (pow(2.0, 60.0) / CAST(GREATEST(kth, 1) AS DOUBLE)), 4) END AS est_distinct
        |FROM agg""".stripMargin,
    "q_link_graph" ->
      """WITH d AS (SELECT doc_id,
        |  'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS src,
        |  'site' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com' AS dst FROM documents),
        |e AS (
        |  SELECT src AS src_domain, dst AS dst_domain FROM d WHERE doc_id % 5 = 0
        |  UNION ALL SELECT src, dst FROM d WHERE doc_id % 5 = 1
        |  UNION ALL SELECT src, src FROM d WHERE doc_id % 5 = 2
        |  UNION ALL SELECT src, src FROM d WHERE doc_id % 5 = 2
        |  UNION ALL SELECT src, src FROM d WHERE doc_id % 5 = 3
        |  UNION ALL SELECT src, 'example.org' FROM d)
        |SELECT src_domain, dst_domain, COUNT(*) AS n_links
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_warc_links" ->
      """WITH d AS (SELECT doc_id,
        |  'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS src,
        |  'site' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com' AS dst FROM documents),
        |e AS (SELECT src AS src_domain, dst AS dst_domain FROM d
        |      UNION ALL SELECT src, src FROM d
        |      UNION ALL SELECT src, 'example.org' FROM d)
        |SELECT src_domain, dst_domain, COUNT(*) AS n_links
        |FROM e GROUP BY 1, 2""".stripMargin,
    // dialog lane: every flag / template string / rollup stated
    // literally from the residue arithmetic (the q_link_graph
    // discipline) — the HOF chains never run oracle-side
    "q_dialog_qa" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 5 WHEN 2 THEN 3 WHEN 4 THEN 4 ELSE 2 END AS BIGINT) AS n_turns,
        |  CAST(CASE doc_id % 5 WHEN 2 THEN 2 WHEN 4 THEN 2 ELSE 1 END AS BIGINT) AS n_user,
        |  CAST(CASE doc_id % 5 WHEN 4 THEN 2 ELSE 1 END AS BIGINT) AS n_assistant,
        |  doc_id % 5 <> 1 AS starts_user,
        |  doc_id % 5 <> 1 AS ends_assistant,
        |  doc_id % 5 <> 2 AS alternates,
        |  doc_id % 5 = 3 AS has_empty,
        |  doc_id % 5 IN (0, 4) AS valid
        |FROM documents""".stripMargin,
    "q_dialog_flatten" ->
      """WITH v AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN
        |    '<|user|>' || chr(10) || 'hi ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |    '<|assistant|>' || chr(10) || 're ' || CAST(doc_id AS VARCHAR) ||
        |    chr(10) || '<|end|>'
        |  ELSE
        |    '<|user|>' || chr(10) || 'q1' || chr(10) || '<|assistant|>' || chr(10) ||
        |    'a1' || chr(10) || '<|user|>' || chr(10) || 'q2' || chr(10) ||
        |    '<|assistant|>' || chr(10) || 'a2' || chr(10) || '<|end|>'
        |  END AS text,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 2 ELSE 4 END AS BIGINT) AS n_turns,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 1 ELSE 2 END AS BIGINT) AS n_user,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 1 ELSE 2 END AS BIGINT) AS n_assistant
        |  FROM documents WHERE doc_id % 5 IN (0, 4))
        |SELECT doc_id, n_turns, n_user, n_assistant, text,
        |  CAST(length(text) AS BIGINT) AS n_chars FROM v""".stripMargin,
    "q_dialog_roles" ->
      """WITH t AS (
        |  SELECT 'user' AS role, 3 + length(CAST(doc_id AS VARCHAR)) AS len
        |    FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT 'assistant', 3 + length(CAST(doc_id AS VARCHAR))
        |    FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT 'assistant', 9 FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL SELECT 'user', 1 FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL SELECT 'user', 1 FROM documents WHERE doc_id % 5 = 2
        |  UNION ALL SELECT 'user', 1 FROM documents WHERE doc_id % 5 = 2
        |  UNION ALL SELECT 'assistant', 1 FROM documents WHERE doc_id % 5 = 2
        |  UNION ALL SELECT 'user', 1 FROM documents WHERE doc_id % 5 = 3
        |  UNION ALL SELECT 'assistant', 0 FROM documents WHERE doc_id % 5 = 3
        |  UNION ALL SELECT 'user', 2 FROM documents WHERE doc_id % 5 = 4
        |  UNION ALL SELECT 'assistant', 2 FROM documents WHERE doc_id % 5 = 4
        |  UNION ALL SELECT 'user', 2 FROM documents WHERE doc_id % 5 = 4
        |  UNION ALL SELECT 'assistant', 2 FROM documents WHERE doc_id % 5 = 4)
        |SELECT role, COUNT(*) AS n_turns, CAST(SUM(len) AS BIGINT) AS total_chars,
        |  round(CAST(SUM(len) AS DOUBLE) / COUNT(*), 4) AS avg_chars
        |FROM t GROUP BY role""".stripMargin,
    "q_pref_qa" ->
      """SELECT doc_id,
        |  doc_id % 4 = 1 AS identical,
        |  doc_id % 4 = 2 AS has_empty,
        |  CASE doc_id % 4 WHEN 0 THEN 3.2 WHEN 1 THEN 1.0 WHEN 2 THEN 0.0
        |       ELSE 0.5 END AS len_ratio,
        |  doc_id % 4 IN (0, 3) AS valid
        |FROM documents""".stripMargin,
    "q_pref_bias" ->
      """WITH v AS (SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 3.2 ELSE 0.5 END AS ratio,
        |    doc_id % 4 = 0 AS longer
        |  FROM documents WHERE doc_id % 4 IN (0, 3))
        |SELECT COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN longer THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
        |  round(CAST(SUM(CASE WHEN longer THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
        |    AS chosen_longer_rate,
        |  round(AVG(ratio), 4) AS avg_len_ratio
        |FROM v""".stripMargin,
    // every output column stated literally from the doc_id residue
    // arithmetic (the q_link_graph discipline) — the WARC build and
    // the record parse never run oracle-side; chr(13)||chr(10) = CRLF
    "q_warc_extract" ->
      """SELECT doc_id,
        |  'http://site' || CAST(doc_id % 20 AS VARCHAR) || '.com/p' ||
        |    CAST(doc_id % 10 AS VARCHAR) AS target_uri,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
        |  CASE WHEN doc_id % 4 = 1 THEN 404 ELSE 200 END AS http_status,
        |  CASE WHEN doc_id % 4 = 0 THEN '<html>ok</html>'
        |       WHEN doc_id % 4 = 1 THEN '<html>notfound</html>'
        |       WHEN doc_id % 4 = 2 THEN 'about:' || chr(13) || chr(10) ||
        |         'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: fake' ||
        |         chr(13) || chr(10) || 'Content-Length: 0' || chr(13) || chr(10) ||
        |         chr(13) || chr(10) || 'more'
        |       ELSE 'part1' || chr(13) || chr(10) || chr(13) || chr(10) || 'part2'
        |  END AS body
        |FROM documents""".stripMargin,
    // the fixture is a pure function of the record index (50 records,
    // two .warc.gz segment files): every column restated from that
    // arithmetic — gzip decode, split resynchronization and WARC parse
    // never run oracle-side. content_length = len('HTTP/1.1 200 OK' +
    // CRLF CRLF + 'body-') + digits = 24 + digits.
    "q_warcgz_crawl" ->
      """SELECT CAST(24 + length(CAST(i AS VARCHAR)) AS BIGINT) AS content_length,
        |  'http://site' || CAST(i % 20 AS VARCHAR) || '.com/p' ||
        |    CAST(i % 10 AS VARCHAR) AS target_uri,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  '<urn:uuid:' || CAST(i AS VARCHAR) || '>' AS record_id,
        |  200 AS http_status,
        |  'body-' || CAST(i AS VARCHAR) AS body
        |FROM (SELECT CAST(range AS BIGINT) AS i FROM range(50))""".stripMargin,
    // decoded bodies stated literally: residue 0 chunked → the
    // concatenated chunk data, residue 1 plain → untouched, residue 2
    // declared-chunked-but-malformed → NULL (quarantine); the dechunk
    // kernel never runs oracle-side
    "q_warc_dechunk" ->
      """SELECT doc_id,
        |  'http://c' || CAST(doc_id % 20 AS VARCHAR) || '.com/x' AS target_uri,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
        |  200 AS http_status,
        |  CASE WHEN doc_id % 3 = 0 THEN 'alpha-' || CAST(doc_id AS VARCHAR) || ':beta'
        |       WHEN doc_id % 3 = 1 THEN 'plain-' || CAST(doc_id AS VARCHAR)
        |       ELSE NULL END AS body
        |FROM documents""".stripMargin,
    // the flattened chat-template text restated literally (the
    // q_dialog_flatten discipline; invalid % 13 dialogs excluded by
    // the WHERE, mirroring the flattenValid gate), then the
    // q_minhash_lsh banding chain re-run over it — the flatten and the
    // LSH both recomputed independently, end to end
    "q_dialog_dedup" ->
      """WITH v AS (SELECT doc_id,
        |    '<|user|>' || chr(10) || 'how do I configure item ' ||
        |      CAST(doc_id % 200 AS VARCHAR) || ' in the build' || chr(10) ||
        |    '<|assistant|>' || chr(10) ||
        |    CASE (doc_id // 200) % 3
        |      WHEN 0 THEN 'set option ' || CAST(doc_id % 200 AS VARCHAR) ||
        |        ' in the config file then rerun'
        |      WHEN 1 THEN 'set option ' || CAST(doc_id % 200 AS VARCHAR) ||
        |        ' in the config file then retry'
        |      ELSE 'set flag ' || CAST(doc_id % 200 AS VARCHAR) ||
        |        ' in the config file then rerun' END ||
        |    chr(10) || '<|end|>' AS text
        |  FROM documents WHERE doc_id % 13 <> 0),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM v),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |hs AS (SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |       FROM sh),
        |mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |       FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        |bands AS (SELECT doc_id, seed // 4 AS band,
        |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |          FROM mh GROUP BY doc_id, seed // 4)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin,
    // terms stated literally from the residue arithmetic: residue 0 →
    // {breaking, news} (markup stripped, case folded), 1 → {news,
    // archive}, 2 → {sports}; extraction never runs oracle-side
    "q_anchor_text" ->
      """WITH d AS (SELECT doc_id,
        |  'site' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.com' AS dom FROM documents),
        |t AS (
        |  SELECT dom, CASE WHEN doc_id % 3 = 0 THEN 'breaking'
        |                   WHEN doc_id % 3 = 1 THEN 'news'
        |                   ELSE 'sports' END AS term FROM d
        |  UNION ALL
        |  SELECT dom, CASE WHEN doc_id % 3 = 0 THEN 'news'
        |                   WHEN doc_id % 3 = 1 THEN 'archive' END FROM d),
        |c AS (SELECT dom AS dst_domain, term, COUNT(*) AS n
        |      FROM t WHERE term IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT dst_domain, term, n,
        |        CAST(row_number() OVER (PARTITION BY dst_domain ORDER BY n DESC, term ASC) AS INT) AS rank
        |      FROM c)
        |SELECT dst_domain, term, n, rank FROM r WHERE rank <= 3""".stripMargin,
    // survivors stated literally per robots flavor f = (doc_id%20)%3:
    // f=0 (prefix Disallows incl. inline comment) → articles+public;
    // f=1 (Disallow-/ + Allow-/public/) → public only; f=2 (/*.html$
    // wildcard + longer Allow-/articles/) → articles only. Parsing,
    // wildcard matching, and longest-match ranking never run
    // oracle-side.
    "q_robots_filter" ->
      """WITH u AS (SELECT doc_id, (doc_id % 20) % 3 AS f,
        |  CASE WHEN doc_id % 4 = 0 THEN 'private' WHEN doc_id % 4 = 1 THEN 'tmp'
        |       WHEN doc_id % 4 = 2 THEN 'articles' ELSE 'public' END AS sec
        |FROM documents)
        |SELECT doc_id,
        |  'http://site' || CAST(doc_id % 20 AS VARCHAR) || '.com/' || sec ||
        |    '/p' || CAST(doc_id AS VARCHAR) || '.html' AS url
        |FROM u WHERE (f = 0 AND sec IN ('articles', 'public'))
        |   OR (f = 1 AND sec = 'public')
        |   OR (f = 2 AND sec = 'articles')""".stripMargin,
    "q_priority_sample" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |k AS (SELECT doc_id, n_tokens,
        |        POWER(('0x' || substr(md5('prio1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0,
        |              1.0 / n_tokens) AS key
        |      FROM d WHERE n_tokens > 0),
        |r AS (SELECT doc_id, n_tokens, key,
        |        CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC) AS INT) AS draw_rank FROM k)
        |SELECT doc_id, n_tokens, ROUND(key, 6) AS draw_key, draw_rank FROM r WHERE draw_rank <= 100""".stripMargin,
    "q_fuzzy_link" ->
      """WITH p AS (SELECT DISTINCT substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 3)
        |                        || substr(md5(CAST(doc_id % 50 AS VARCHAR)), 5, 4)
        |                        || '.example.com' AS probe
        |           FROM documents WHERE doc_id % 7 = 0),
        |d AS (SELECT DISTINCT substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 8)
        |                   || '.example.com' AS m FROM documents),
        |c AS (SELECT p.probe, d.m, CAST(levenshtein(p.probe, d.m) AS INTEGER) AS dist
        |      FROM p CROSS JOIN d WHERE levenshtein(p.probe, d.m) <= 1),
        |r AS (SELECT probe, m, dist,
        |             row_number() OVER (PARTITION BY probe ORDER BY dist ASC, m ASC) AS rn
        |      FROM c)
        |SELECT probe, m AS "match", dist FROM r WHERE rn = 1""".stripMargin,
    "q_oov_rate" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |v AS (SELECT tok FROM cnt ORDER BY c DESC, tok ASC LIMIT 20)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN t.tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
        |  round(CAST(SUM(CASE WHEN t.tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*), 4) AS oov_rate
        |FROM toks t GROUP BY doc_id""".stripMargin,
    "q_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS g
        |      FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |df AS (SELECT g, COUNT(*) AS df, MIN(doc_id) AS d1 FROM g GROUP BY g),
        |uniq AS (SELECT d1 AS doc_id, COUNT(*) AS n_unique FROM df WHERE df = 1 GROUP BY d1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams, COALESCE(u.n_unique, 0) AS n_unique,
        |  round(CAST(COALESCE(u.n_unique, 0) AS DOUBLE) / t.n_grams, 4) AS novelty
        |FROM tot t LEFT JOIN uniq u USING (doc_id)""".stripMargin,
    "q_winnow" ->
      s"""WITH $winnowCtes
         |SELECT DISTINCT doc_id, i AS pos, fp FROM sel WHERE rn = 1""".stripMargin,
    "q_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         |cnt AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp),
         |ok AS (SELECT fp FROM cnt WHERE nd > 1 AND nd <= 50),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |      JOIN ok ON ok.fp = a.fp)
         |SELECT doc_a, doc_b, COUNT(*) AS n_shared
         |FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |p AS (SELECT query_id, vec_id, label, qe, embedding AS ee FROM embeddings, q WHERE label <> ql),
        |u AS (SELECT query_id, vec_id, label, unnest(qe) AS qv, unnest(ee) AS ev FROM p),
        |d AS (SELECT query_id, vec_id, label,
        |        SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
        |        SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
        |        SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
        |      FROM u GROUP BY 1, 2, 3),
        |c AS (SELECT query_id, vec_id, label, round(dp / (sqrt(qq) * sqrt(ee2)), 6) + CAST(0 AS DOUBLE) AS cos_sim FROM d),
        |r AS (SELECT query_id, vec_id, label, cos_sim,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |      FROM c)
        |SELECT query_id, vec_id, label, cos_sim, rank FROM r WHERE rank <= 8""".stripMargin,
    "q_embed_outliers" ->
      """WITH u AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
        |           FROM embeddings),
        |cent AS (SELECT label, d,
        |           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS c
        |         FROM u GROUP BY 1, 2),
        |dist AS (SELECT u.vec_id, u.label,
        |           round(sqrt(SUM((CAST(u.v AS DOUBLE) - cent.c) * (CAST(u.v AS DOUBLE) - cent.c))), 6) AS dist
        |         FROM u JOIN cent USING (label, d) GROUP BY 1, 2),
        |st AS (SELECT label, COUNT(*) AS n,
        |         CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |         CAST(SUM(CAST(dist AS DECIMAL(18,6)) * CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS sq
        |       FROM dist GROUP BY 1),
        |m AS (SELECT label, s / n AS mean, sqrt(greatest(sq / n - (s / n) * (s / n), 0)) AS std FROM st)
        |SELECT d.vec_id, d.label, d.dist,
        |  round((d.dist - m.mean) / m.std, 4) + CAST(0 AS DOUBLE) AS z,
        |  CAST(abs(d.dist - m.mean) > 2.0 * m.std AS INT) AS is_outlier
        |FROM dist d JOIN m USING (label) WHERE m.std > 0""".stripMargin,
    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS pv
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts_us, round(r.pv, 4) AS last_purchase
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts_us <= l.ts_us""".stripMargin,
    "q_cusum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |p AS (SELECT *, SUM(v - 50.00 - 5.00) OVER w AS pu, SUM(50.00 - v - 5.00) OVER w AS pd
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT *, pu - LEAST(0, MIN(pu) OVER w) AS su, pd - LEAST(0, MIN(pd) OVER w) AS sd
        |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, ts_us, event_id, round(CAST(v AS DOUBLE), 2) AS value,
        |       round(CAST(su AS DOUBLE), 2) AS cusum_up, round(CAST(sd AS DOUBLE), 2) AS cusum_down
        |FROM m WHERE su > 300.00 OR sd > 300.00""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |p1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
        |                   OVER (PARTITION BY user_id) AS t1 FROM e),
        |p2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1
        |                           AND ts_us <= t1 + 172800000000 THEN ts_us END)
        |                   OVER (PARTITION BY user_id) AS t2 FROM p1),
        |p3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
        |                           AND ts_us <= t1 + 172800000000 THEN ts_us END)
        |                   OVER (PARTITION BY user_id) AS t3 FROM p2),
        |u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3 FROM p3 GROUP BY user_id),
        |c AS (SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3 FROM u),
        |s AS (SELECT 1 AS step_idx, 'view' AS step_name, n1 AS n_users, n1 AS d FROM c
        |      UNION ALL SELECT 2, 'click', n2, n1 FROM c
        |      UNION ALL SELECT 3, 'purchase', n3, n1 FROM c)
        |SELECT step_idx, step_name, n_users,
        |       CASE WHEN d = 0 THEN 0.0
        |            ELSE round(CAST(n_users AS DOUBLE) / d, 4) END AS conv_rate
        |FROM s""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT *, MIN(ts_us) OVER (PARTITION BY user_id) AS first_ts FROM e),
        |pr AS (SELECT user_id,
        |         CAST((first_ts - first_ts % 604800000000) / 604800000000 AS BIGINT) AS cohort_period,
        |         CAST((ts_us - ts_us % 604800000000) / 604800000000 AS BIGINT)
        |           - CAST((first_ts - first_ts % 604800000000) / 604800000000 AS BIGINT) AS period_offset
        |       FROM f),
        |a AS (SELECT cohort_period, period_offset, COUNT(DISTINCT user_id) AS n_active
        |      FROM pr GROUP BY 1, 2),
        |s AS (SELECT *, MAX(CASE WHEN period_offset = 0 THEN n_active END)
        |                  OVER (PARTITION BY cohort_period) AS sz FROM a)
        |SELECT cohort_period, period_offset, n_active,
        |       round(CAST(n_active AS DOUBLE) / sz, 4) AS retention
        |FROM s""".stripMargin,
    "q_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS pv
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts_us, round(r.pv, 4) AS next_purchase
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts_us >= l.ts_us""".stripMargin,
    "q_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS pv
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |b AS (SELECT l.event_id, l.user_id, l.ts_us, r.pv AS bv, r.ts_us AS bt
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts_us <= l.ts_us),
        |f AS (SELECT l.event_id, r.pv AS fv, r.ts_us AS ft
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts_us >= l.ts_us)
        |SELECT b.event_id, b.user_id, b.ts_us,
        |  round(CASE
        |    WHEN (bt IS NOT NULL AND b.ts_us - bt <= 3600000000)
        |         AND (NOT (ft IS NOT NULL AND ft - b.ts_us <= 3600000000)
        |              OR (b.ts_us - bt) <= (ft - b.ts_us)) THEN bv
        |    WHEN ft IS NOT NULL AND ft - b.ts_us <= 3600000000 THEN fv
        |    END, 4) AS near_purchase
        |FROM b JOIN f USING (event_id)""".stripMargin,
    "q_vad" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 39)) AS aud_id),
        |lens AS (SELECT aud_id, 400 + (aud_id % 5) * 160 AS len FROM ids),
        |s AS (SELECT aud_id, i, ((aud_id * 37 + i * 131) % 65536) - 32768 AS v, i // 160 AS frame
        |      FROM lens, unnest(generate_series(0, len - 1)) AS u(i)),
        |f AS (SELECT aud_id, frame, COUNT(*) AS n, SUM(v * v) AS ss FROM s GROUP BY 1, 2),
        |vo AS (SELECT aud_id, frame FROM f WHERE ss > 358000000 * n),
        |i AS (SELECT aud_id, frame,
        |        frame - row_number() OVER (PARTITION BY aud_id ORDER BY frame) AS isl
        |      FROM vo),
        |d AS (SELECT aud_id, frame,
        |        dense_rank() OVER (PARTITION BY aud_id ORDER BY isl) - 1 AS seg_id
        |      FROM i)
        |SELECT CAST(aud_id AS BIGINT) AS aud_id, CAST(seg_id AS INT) AS seg_id,
        |       CAST(MIN(frame) AS INT) AS start_frame, CAST(MAX(frame) AS INT) AS end_frame,
        |       CAST(COUNT(*) AS INT) AS n_frames
        |FROM d GROUP BY aud_id, seg_id""".stripMargin,
    "q_image_phash" -> imagePhashOracleSql,
    "q_image_dhash" ->
      s"""WITH $dhashCtes
         |SELECT CAST(img_id AS BIGINT) AS img_id, dhash_hi, dhash_lo FROM hs""".stripMargin,
    "q_image_neardup" ->
      s"""WITH $dhashCtes
         |SELECT CAST(a.img_id AS BIGINT) AS img_a, CAST(b.img_id AS BIGINT) AS img_b,
         |  CAST(bit_count(xor(a.dhash_hi, b.dhash_hi)) + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT) AS hamming
         |FROM hs a JOIN hs b ON a.img_id < b.img_id
         |WHERE bit_count(xor(a.dhash_hi, b.dhash_hi)) + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2""".stripMargin,
    "q_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |nv AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cnt),
        |sc AS (SELECT t.doc_id, round(exp(-SUM(ln((c + 1) / (n + v))) / COUNT(*)), 4) AS ppl
        |       FROM toks t JOIN cnt USING (tok) CROSS JOIN nv GROUP BY t.doc_id),
        |sl AS (SELECT sc.doc_id, d.lang, sc.ppl FROM sc JOIN documents d USING (doc_id)),
        |h AS (SELECT lang, ppl, COUNT(*) AS c FROM sl GROUP BY 1, 2),
        |w AS (SELECT lang, ppl,
        |        SUM(c) OVER (PARTITION BY lang ORDER BY ppl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS n_less,
        |        SUM(c) OVER (PARTITION BY lang) AS n
        |      FROM h)
        |SELECT sl.doc_id, sl.lang, sl.ppl,
        |  CASE WHEN w.n_less * 3 < w.n THEN 'head'
        |       WHEN w.n_less * 3 < 2 * w.n THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sl JOIN w ON sl.lang = w.lang AND sl.ppl = w.ppl""".stripMargin,
    "q_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT doc_id, i FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |      WHERE t[i] = 'batch' AND t[i + 1] = 'batch')
        |SELECT doc_id, COUNT(*) AS n_hits, CAST(MIN(i) - 1 AS INT) AS first_pos
        |FROM p GROUP BY doc_id""".stripMargin,
    "q_url_normalize" ->
      s"""WITH $urlCanonCte
         |SELECT doc_id, url_norm, domain FROM c""".stripMargin,
    // expected canonical + PSL domain stated LITERALLY per residue —
    // the normalizer never runs here (a bug cannot cancel out)
    "q_url_curation" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 0 THEN 'http://shop.example.co.uk/p/~alice'
        |    WHEN 1 THEN 'https://a.b.news.ac.jp/x?a=1&b=2'
        |    WHEN 2 THEN 'http://User:PW@www.big.com.au:8080/AB'
        |    WHEN 3 THEN 'http://deep.sub.other.org/a%2Fb?z=z'
        |    WHEN 4 THEN 'https://gov.uk/services'
        |    ELSE 'http://example.com/~09' END AS url_norm,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 0 THEN 'example.co.uk'
        |    WHEN 1 THEN 'news.ac.jp'
        |    WHEN 2 THEN 'big.com.au'
        |    WHEN 3 THEN 'other.org'
        |    WHEN 4 THEN 'gov.uk'
        |    ELSE 'example.com' END AS domain
        |FROM documents""".stripMargin,
    "q_domain_stats" ->
      s"""WITH $urlCanonCte
         |SELECT domain, COUNT(*) AS n_pages,
         |  COUNT(DISTINCT url_norm) AS n_unique_urls,
         |  round(CAST(1 AS DOUBLE) - CAST(COUNT(DISTINCT url_norm) AS DOUBLE) / COUNT(*), 4) AS dup_rate
         |FROM c GROUP BY domain""".stripMargin,
    "q_url_dedup" ->
      s"""WITH $urlCanonCte
         |SELECT doc_id, url_norm FROM (
         |  SELECT doc_id, url_norm,
         |         row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
         |  FROM c) WHERE rn = 1""".stripMargin,
    "q_rec_catalog" -> recCatalogOracleSql,
    "q_rec_session" -> recSessionOracleSql,
    "q_rec_extract" -> recExtractOracleSql,
    "q_rec_uv" -> recUvOracleSql,
    "q_image_resize" -> imageResizeOracleSql,
    "q_audio_frames" -> audioFramesOracleSql,
    "q_pagerank" -> pagerankOracleSql,
    "q_ppr" -> pprRecurrenceSql(
      linkGraphEdgesCtes,
      "SELECT 'example.org' AS node UNION ALL SELECT 'site0.com'",
      iterations = 5),
    "q_session_epochs" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events),
         |d AS (SELECT ts_us, CASE WHEN ts_us - lag(ts_us) OVER (ORDER BY ts_us) >= $GlobalGapUs THEN 1 ELSE 0 END AS brk FROM e),
         |s AS (SELECT ts_us, SUM(brk) OVER (ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment_id FROM d)
         |SELECT CAST(segment_id AS BIGINT) AS segment_id, MIN(ts_us) AS start_us, MAX(ts_us) + 1 AS stop_us, COUNT(*) AS n_events
         |FROM s GROUP BY segment_id""".stripMargin,
    "q_user_sessions" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |d AS (SELECT user_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) >= $UserGapUs THEN 1 ELSE 0 END AS brk FROM e),
         |s AS (SELECT user_id, ts_us, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment_id FROM d)
         |SELECT user_id, CAST(segment_id AS BIGINT) AS segment_id, MIN(ts_us) AS start_us, MAX(ts_us) + 1 AS stop_us, COUNT(*) AS n_events
         |FROM s GROUP BY user_id, segment_id""".stripMargin,
    "q_median_step" ->
      """WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events),
        |d AS (SELECT ts_us - lag(ts_us) OVER (ORDER BY ts_us) AS d FROM e)
        |SELECT round(median(d), 1) AS step FROM d WHERE d IS NOT NULL""".stripMargin,
    "q_gap_stats" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events),
         |d AS (SELECT ts_us, CASE WHEN ts_us - lag(ts_us) OVER (ORDER BY ts_us) >= $GlobalGapUs THEN 1 ELSE 0 END AS brk FROM e),
         |s AS (SELECT ts_us, SUM(brk) OVER (ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment_id FROM d),
         |g AS (SELECT CAST(segment_id AS BIGINT) AS segment_id, MIN(ts_us) AS start_us, MAX(ts_us) + 1 AS stop_us FROM s GROUP BY segment_id)
         |SELECT segment_id, start_us, stop_us,
         |       COALESCE(start_us - lag(stop_us) OVER (ORDER BY segment_id), -1) AS gap_before_us
         |FROM g""".stripMargin,
    "q_dedup_keep_first" ->
      """SELECT ts_min, event_id, user_id FROM (
        |  SELECT epoch_us(ts) // 60000000 AS ts_min, event_id, user_id,
        |         row_number() OVER (PARTITION BY epoch_us(ts) // 60000000 ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_gapfill" ->
      """WITH s AS (SELECT event_id AS sts, value FROM events WHERE event_id % 7 <> 0),
        |w AS (SELECT sts, value, lead(sts) OVER (ORDER BY sts) AS nts, lead(value) OVER (ORDER BY sts) AS nv FROM s),
        |g AS (SELECT unnest(generate_series(sts + 1, nts - 1)) AS gts, sts, value, nts, nv
        |      FROM w WHERE nts IS NOT NULL AND nts - sts > 1 AND nts - sts <= 6)
        |SELECT sts, round(value, 4) AS value, 0 AS interpolated FROM s
        |UNION ALL
        |SELECT gts AS sts, round(value + (gts - sts) * (nv - value) / (nts - sts), 4) AS value, 1 AS interpolated FROM g""".stripMargin,
    "q_ts_validation" ->
      """WITH e AS (SELECT epoch_us(ts) AS ts_us, event_id FROM events),
        |p AS (SELECT ts_us, lag(ts_us) OVER (ORDER BY event_id) AS prev FROM e)
        |SELECT COUNT(*) AS n_rows,
        |       COUNT(*) - COUNT(DISTINCT ts_us) AS n_dup_rows,
        |       CAST(COALESCE(SUM(CASE WHEN ts_us < prev THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_out_of_order,
        |       CAST(COALESCE(SUM(CASE WHEN ts_us < prev THEN 1 ELSE 0 END), 0) = 0 AS INT) AS is_sorted,
        |       CAST(COUNT(*) > COUNT(DISTINCT ts_us) AS INT) AS has_dups
        |FROM p""".stripMargin,
    "q_mad_crossings" ->
      """WITH t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |h AS (SELECT event_id, value FROM events, t WHERE value > thr)
        |SELECT a.event_id AS event_id, a.value AS value
        |FROM h a JOIN h b ON a.event_id + 1 = b.event_id""".stripMargin,
    "q_patch_extract" ->
      """WITH t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |h AS (SELECT event_id, value FROM events, t WHERE value > thr),
        |p AS (SELECT a.event_id AS peak_idx FROM h a JOIN h b ON a.event_id + 1 = b.event_id)
        |SELECT p.peak_idx, e.event_id - p.peak_idx AS offset, e.value AS value
        |FROM events e JOIN p ON e.event_id >= p.peak_idx - 3 AND e.event_id < p.peak_idx + 3""".stripMargin,
    "q_sta" ->
      """WITH t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |h AS (SELECT event_id, value FROM events, t WHERE value > thr),
        |p AS (SELECT a.event_id AS peak_idx FROM h a JOIN h b ON a.event_id + 1 = b.event_id),
        |x AS (SELECT e.event_id - p.peak_idx AS "offset", CAST(e.value AS DECIMAL(18,2)) AS v
        |      FROM events e JOIN p ON e.event_id >= p.peak_idx - 3 AND e.event_id < p.peak_idx + 3)
        |SELECT "offset", CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_value
        |FROM x GROUP BY "offset"""".stripMargin,
    "q_psd" -> psdOracleSql,
    "q_band_power" -> bandPowerOracleSql,
    "q_stft" -> stftOracleSql,
    "q_xcorr" -> xcorrOracleSql,
    "q_ripples" -> ripplesOracleSql,
    "q_coherence" -> coherenceOracleSql,
    "q_zscore" ->
      """WITH st AS (SELECT event_type, COUNT(CAST(value AS DECIMAL(18,2))) AS n,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq
        |      FROM events GROUP BY event_type),
        |m AS (SELECT event_type, s / n AS mean, sqrt(greatest(sq / n - (s / n) * (s / n), 0)) AS std FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - m.mean) / m.std, 4) AS z,
        |  round(m.mean, 4) AS group_mean
        |FROM events e JOIN m USING (event_type)
        |WHERE m.std > 0 AND abs(e.value - m.mean) > 2.0 * m.std""".stripMargin,
    "q_event_windows" ->
      """SELECT (epoch_us(ts) // 900000000) * 900000000 AS win_start_us, event_type,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_running_sum" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
        |FROM events""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.09
        |  AND l_quantity < 24""".stripMargin,
    "q_doc_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_text,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS type_token_ratio
        |FROM documents""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |         array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
        |          GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b,
        |       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.8""".stripMargin,
    "q_vocab" ->
      """SELECT source, COUNT(DISTINCT tok) AS vocab
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY source""".stripMargin,
    "q_dup_rate" ->
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique,
        |  round(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS dup_rate
        |FROM documents GROUP BY source""".stripMargin,
    "q_containment" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |         array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
        |          GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b,
        |       round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4) AS containment,
        |       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4) >= 0.6""".stripMargin,
    "q_sim_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |p AS (SELECT query_id, vec_id, qe, embedding AS ee FROM embeddings, q WHERE vec_id <> query_id),
        |u AS (SELECT query_id, vec_id, unnest(qe) AS qv, unnest(ee) AS ev FROM p),
        |d AS (SELECT query_id, vec_id,
        |        SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
        |        SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
        |        SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
        |      FROM u GROUP BY query_id, vec_id),
        |c AS (SELECT query_id, vec_id, round(dp / (sqrt(qq) * sqrt(ee2)), 6) AS cos_sim FROM d),
        |r AS (SELECT query_id, vec_id, cos_sim,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |      FROM c)
        |SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10""".stripMargin,
    "q_knn_graph" ->
      """WITH nodes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id, q.embedding AS qe, c.embedding AS ee
        |      FROM nodes q JOIN nodes c ON q.vec_id <> c.vec_id),
        |u AS (SELECT query_id, vec_id, unnest(qe) AS qv, unnest(ee) AS ev FROM p),
        |d AS (SELECT query_id, vec_id,
        |        SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
        |        SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
        |        SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
        |      FROM u GROUP BY query_id, vec_id),
        |c AS (SELECT query_id, vec_id, round(dp / (sqrt(qq) * sqrt(ee2)), 6) AS cos_sim FROM d),
        |r AS (SELECT query_id, vec_id, cos_sim,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |      FROM c),
        |topk AS (SELECT * FROM r WHERE rank <= 5)
        |SELECT f.query_id AS a, f.vec_id AS b, f.cos_sim,
        |  CAST(f.rank AS INT) AS rank_ab, CAST(g.rank AS INT) AS rank_ba
        |FROM topk f JOIN topk g ON g.query_id = f.vec_id AND g.vec_id = f.query_id
        |WHERE f.query_id < f.vec_id""".stripMargin,
    "q_minhash_lsh" ->
      s"""$minhashBandsCte
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin,
    // the q_minhash_lsh pair set rolled up to a normalized (source,
    // source) leakage matrix
    "q_source_overlap" ->
      s"""$minhashBandsCte,
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM bands a JOIN bands b
        |            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |ps AS (SELECT least(da.source, db.source) AS source_a,
        |              greatest(da.source, db.source) AS source_b
        |       FROM pairs
        |       JOIN documents da ON da.doc_id = pairs.doc_a
        |       JOIN documents db ON db.doc_id = pairs.doc_b)
        |SELECT source_a, source_b, COUNT(*) AS n_pairs
        |FROM ps GROUP BY source_a, source_b""".stripMargin,
    "q_dedup_incremental" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |hs AS (SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |       FROM sh),
        |mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |       FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        |bands AS (SELECT doc_id, seed // 4 AS band,
        |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |          FROM mh GROUP BY doc_id, seed // 4),
        |cb AS (SELECT * FROM bands WHERE doc_id % 4 <> 0),
        |nb AS (SELECT * FROM bands WHERE doc_id % 4 = 0),
        |vs_corpus AS (SELECT DISTINCT nb.doc_id FROM nb JOIN cb
        |                ON nb.band = cb.band AND nb.band_key = cb.band_key),
        |bmin AS (SELECT band, band_key, MIN(doc_id) AS min_id FROM nb GROUP BY band, band_key),
        |within_new AS (SELECT DISTINCT nb.doc_id FROM nb JOIN bmin
        |                 ON nb.band = bmin.band AND nb.band_key = bmin.band_key
        |                    AND nb.doc_id > bmin.min_id)
        |SELECT d.doc_id,
        |  CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup_of_corpus,
        |  CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup_within_new
        |FROM documents d
        |LEFT JOIN vs_corpus v ON d.doc_id = v.doc_id
        |LEFT JOIN within_new w ON d.doc_id = w.doc_id
        |WHERE d.doc_id % 4 = 0""".stripMargin,
    // same band-key pipeline; collisions become CANDIDATE pairs whose
    // matching-signature-component count must reach 8/16 (= estimated
    // Jaccard 0.5) before flagging — integer compare on both sides
    "q_dedup_incremental_verified" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |hs AS (SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |       FROM sh),
        |mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |       FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        |bands AS (SELECT doc_id, seed // 4 AS band,
        |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |          FROM mh GROUP BY doc_id, seed // 4),
        |cb AS (SELECT * FROM bands WHERE doc_id % 4 <> 0),
        |nb AS (SELECT * FROM bands WHERE doc_id % 4 = 0),
        |cand_c AS (SELECT DISTINCT nb.doc_id AS nid, cb.doc_id AS cid FROM nb JOIN cb
        |             ON nb.band = cb.band AND nb.band_key = cb.band_key),
        |vs_corpus AS (SELECT DISTINCT nid AS doc_id FROM
        |                (SELECT c.nid, c.cid,
        |                   SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END) AS nmatch
        |                 FROM cand_c c
        |                 JOIN mh ma ON ma.doc_id = c.nid
        |                 JOIN mh mb ON mb.doc_id = c.cid AND mb.seed = ma.seed
        |                 GROUP BY c.nid, c.cid)
        |              WHERE nmatch >= 8),
        |cand_w AS (SELECT DISTINCT a.doc_id AS aid, b.doc_id AS bid FROM nb a JOIN nb b
        |             ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |within_new AS (SELECT DISTINCT bid AS doc_id FROM
        |                 (SELECT c.aid, c.bid,
        |                    SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END) AS nmatch
        |                  FROM cand_w c
        |                  JOIN mh ma ON ma.doc_id = c.aid
        |                  JOIN mh mb ON mb.doc_id = c.bid AND mb.seed = ma.seed
        |                  GROUP BY c.aid, c.bid)
        |               WHERE nmatch >= 8)
        |SELECT d.doc_id,
        |  CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup_of_corpus,
        |  CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup_within_new
        |FROM documents d
        |LEFT JOIN vs_corpus v ON d.doc_id = v.doc_id
        |LEFT JOIN within_new w ON d.doc_id = w.doc_id
        |WHERE d.doc_id % 4 = 0""".stripMargin,
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |e AS (SELECT doc_id, toks, unnest(generate_series(0, (len(toks) - 1) // 28)) AS chunk_id FROM t)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(least(32, len(toks) - chunk_id * 28) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(toks[chunk_id * 28 + 1 : chunk_id * 28 + 32], ' ') AS chunk_text
        |FROM e""".stripMargin,
    "q_corpus_stats" ->
      """WITH t AS (SELECT source, len(string_split(text, ' ')) AS nt, length(text) AS nc FROM documents)
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  round(AVG(nt), 4) AS mean_tokens,
        |  round(quantile_cont(nt, 0.5), 4) AS p50_tokens,
        |  round(quantile_cont(nt, 0.9), 4) AS p90_tokens,
        |  round(AVG(nc), 4) AS mean_chars
        |FROM t GROUP BY source""".stripMargin,
    "q_split_assign" ->
      """SELECT doc_id, source,
        |  CASE WHEN ('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 < 0.8 THEN 'train'
        |       WHEN ('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY ('0x' || substr(md5('shuf1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0,
        |             doc_id) - 1 AS shuffle_rank
        |FROM documents""".stripMargin,
    "q_decimate" ->
      """WITH r AS (SELECT user_id, event_id,
        |             row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn,
        |             COUNT(*) OVER (PARTITION BY user_id) AS n
        |           FROM events)
        |SELECT user_id, event_id FROM r WHERE rn % 10 = 0 OR rn = n - 1""".stripMargin,
    "q_tetrode" ->
      """WITH chans AS (SELECT event_id // 4 AS idx, event_id % 4 AS channel, value FROM events),
        |c0 AS (SELECT idx, value FROM chans WHERE channel = 0),
        |t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM c0),
        |h AS (SELECT idx, value FROM c0, t WHERE value > thr),
        |p AS (SELECT a.idx AS peak_idx FROM h a JOIN h b ON a.idx + 1 = b.idx),
        |patches AS (SELECT p.peak_idx, c.channel, c.idx - p.peak_idx AS offset, c.value
        |            FROM chans c JOIN p ON c.idx >= p.peak_idx - 2 AND c.idx < p.peak_idx + 2),
        |ok AS (SELECT peak_idx FROM patches GROUP BY peak_idx HAVING MAX(abs(value)) < 240.0)
        |SELECT patches.peak_idx, channel, "offset", value,
        |       round(patches.peak_idx / 1000.0, 9) AS time_s
        |FROM patches JOIN ok ON patches.peak_idx = ok.peak_idx""".stripMargin,
    "q_lang_margin" ->
      """WITH s AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die'))) AS s_de,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS s_en,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('el', 'la'))) AS s_es,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('le', 'un'))) AS s_fr
        |FROM documents),
        |o AS (SELECT doc_id, s_de, s_en, s_es, s_fr,
        |        list_sort([s_de, s_en, s_es, s_fr], 'DESC') AS srt
        |      FROM s)
        |SELECT doc_id,
        |  CASE WHEN s_de = srt[1] AND srt[1] > 0 THEN 'de'
        |       WHEN s_en = srt[1] AND srt[1] > 0 THEN 'en'
        |       WHEN s_es = srt[1] AND srt[1] > 0 THEN 'es'
        |       WHEN s_fr = srt[1] AND srt[1] > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_pred,
        |  CAST(srt[1] AS INT) AS best_count,
        |  CAST(srt[1] - srt[2] AS INT) AS margin
        |FROM o""".stripMargin,
    "q_lang_id" ->
      """WITH s AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die'))) AS s_de,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS s_en,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('el', 'la'))) AS s_es,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('le', 'un'))) AS s_fr
        |FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr) AND greatest(s_de, s_en, s_es, s_fr) > 0 THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) AND greatest(s_de, s_en, s_es, s_fr) > 0 THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) AND greatest(s_de, s_en, s_es, s_fr) > 0 THEN 'es'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) AND greatest(s_de, s_en, s_es, s_fr) > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM s""".stripMargin,
    "q_fingerprints" ->
      """SELECT doc_id, md5(text) AS md5_hex,
        |  list_reduce(
        |    list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS poly_hash
        |FROM documents""".stripMargin,
    "q_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |th AS (SELECT doc_id,
        |         ('0x' || substr(md5(t), 1, 8))::BIGINT AS th_hi,
        |         ('0x' || substr(md5(t), 9, 8))::BIGINT AS th_lo
        |       FROM tok),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN ((CASE WHEN b < 32 THEN th_lo ELSE th_hi END
        |                           >> (CASE WHEN b < 32 THEN b ELSE b - 32 END)) & 1) = 1
        |                    THEN 1 ELSE -1 END) AS s
        |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
        |         GROUP BY doc_id, b)
        |SELECT doc_id,
        |  bit_or(CASE WHEN s > 0 THEN
        |           (CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << b) END)
        |         ELSE 0 END) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    // real-decode path: the oracle recomputes dims + pooled-luma
    // features from the fixture's pure-arithmetic pixels (BT.601
    // integer luma, 1-D box buckets, floor means) — no decoder runs
    // on the oracle side, so agreement certifies the JDK decode
    "q_multimodal" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 39)) AS img_id),
        |dims AS (SELECT img_id, 16 + img_id % 7 AS w, 12 + img_id % 5 AS h FROM ids),
        |px AS (SELECT img_id, w, h, ux.x AS x, uy.y AS y
        |       FROM dims, unnest(generate_series(0, w - 1)) AS ux(x),
        |                  unnest(generate_series(0, h - 1)) AS uy(y)),
        |g AS (SELECT img_id, (y * w + x) * 8 // (w * h) AS fi,
        |        (299 * ((img_id * 31 + x * 7 + y * 13) % 256)
        |         + 587 * ((img_id * 17 + x * 3 + y * 11) % 256)
        |         + 114 * ((img_id * 23 + x * 5 + y * 19) % 256)) // 1000 AS gray
        |      FROM px),
        |f AS (SELECT img_id, fi, SUM(gray) // COUNT(*) AS fm FROM g GROUP BY 1, 2),
        |fb AS (SELECT d.img_id, d.w, d.h, u.fi
        |       FROM dims d, unnest(generate_series(0, 7)) AS u(fi))
        |SELECT CAST(fb.img_id AS BIGINT) AS img_id, CAST(fb.w AS INT) AS width,
        |       CAST(fb.h AS INT) AS height, CAST(fb.fi AS INT) AS fi,
        |       CAST(COALESCE(f.fm, 0) AS DOUBLE) AS fv
        |FROM fb LEFT JOIN f ON f.img_id = fb.img_id AND f.fi = fb.fi""".stripMargin,
    "q_embed_neardup" ->
      """WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.embedding AS ea, b.embedding AS eb
        |           FROM embeddings a JOIN embeddings b
        |             ON a.label = b.label AND a.vec_id < b.vec_id),
        |u AS (SELECT vec_a, vec_b, unnest(ea) AS x, unnest(eb) AS y FROM p),
        |d AS (SELECT vec_a, vec_b,
        |        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dp,
        |        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS xx,
        |        SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS yy
        |      FROM u GROUP BY vec_a, vec_b)
        |SELECT vec_a, vec_b, round(dp / (sqrt(xx) * sqrt(yy)), 6) AS cos_sim
        |FROM d WHERE round(dp / (sqrt(xx) * sqrt(yy)), 6) >= 0.3""".stripMargin,
    // bucket expression GENERATED from the live plane constants
    // (Similarity.lshBucketSql) — candidates are same-bucket pairs, the
    // cosine is the usual unnest-SUM rounded at 6dp
    "q_sign_lsh" -> {
      val bucket = Similarity.lshBucketSql("embedding", 64, 8)
      s"""WITH bk AS MATERIALIZED (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.embedding AS ea, y.embedding AS eb
         |      FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |u AS (SELECT vec_a, vec_b, unnest(ea) AS xv, unnest(eb) AS yv FROM p),
         |d AS (SELECT vec_a, vec_b,
         |        SUM(CAST(xv AS DOUBLE) * CAST(yv AS DOUBLE)) AS dp,
         |        SUM(CAST(xv AS DOUBLE) * CAST(xv AS DOUBLE)) AS xx,
         |        SUM(CAST(yv AS DOUBLE) * CAST(yv AS DOUBLE)) AS yy
         |      FROM u GROUP BY vec_a, vec_b)
         |SELECT vec_a, vec_b, round(dp / (sqrt(xx) * sqrt(yy)), 6) AS cos_sim
         |FROM d WHERE round(dp / (sqrt(xx) * sqrt(yy)), 6) >= 0.3""".stripMargin
    },
    "q_ivf_topk" -> ivfOracleSql,
    // serving path probes the SAME cells at nProbe == nLists — exact
    "q_ivf_serve" -> ivfOracleSql,
    // binary-quantization serving: the pack expression is GENERATED
    // from the live kernel spelling (Bq.packSignBitsSql); full probing
    // keeps cells out of the oracle, but the Hamming top-50 shortlist
    // and its (ham asc, vec_id asc) tie-break are replayed exactly —
    // the rerank can only reorder within the shortlist
    "q_bq_serve" -> {
      val packC = graft.ops.Bq.packSignBitsSql("embedding", 64)
      val packQ = graft.ops.Bq.packSignBitsSql("qe", 64)
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |qc AS (SELECT query_id, qe, """.stripMargin + packQ + """ AS qcode FROM q),
        |c AS (SELECT vec_id, embedding, """.stripMargin + packC + """ AS code FROM embeddings),
        |h AS (SELECT query_id, vec_id, qe, embedding AS ee,
        |        list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 2),
        |          w -> bit_count(xor(code[w], qcode[w]))::BIGINT)), (a, b) -> a + b) AS ham
        |      FROM c, qc WHERE vec_id <> query_id),
        |sl AS (SELECT query_id, vec_id, qe, ee,
        |         row_number() OVER (PARTITION BY query_id ORDER BY ham ASC, vec_id ASC) AS hr
        |       FROM h),
        |u AS (SELECT query_id, vec_id, unnest(qe) AS qv, unnest(ee) AS ev FROM sl WHERE hr <= 50),
        |d AS (SELECT query_id, vec_id,
        |        SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
        |        SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
        |        SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
        |      FROM u GROUP BY query_id, vec_id),
        |c2 AS (SELECT query_id, vec_id, round(dp / (sqrt(qq) * sqrt(ee2)), 6) AS cos_sim FROM d),
        |r AS (SELECT query_id, vec_id, cos_sim,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |      FROM c2)
        |SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""".stripMargin
    },
    "q_car" ->
      """WITH chans AS (SELECT event_id // 4 AS idx, event_id % 4 AS channel, value FROM events),
        |car AS (SELECT idx, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS car
        |        FROM chans GROUP BY idx)
        |SELECT chans.idx, channel, round(value - car, 6) AS value
        |FROM chans JOIN car ON chans.idx = car.idx""".stripMargin,
    // censor IS SQL-expressible — as a recursive CTE walking kept events
    "q_spike_censor" ->
      """WITH RECURSIVE t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |h0 AS (SELECT event_id, value FROM events, t WHERE value > thr),
        |h AS (SELECT a.event_id AS idx, a.value AS value FROM h0 a JOIN h0 b ON a.event_id + 1 = b.event_id),
        |keep(idx) AS (
        |  SELECT MIN(idx) FROM h
        |  UNION ALL
        |  SELECT (SELECT MIN(h.idx) FROM h WHERE h.idx >= keep.idx + 5)
        |  FROM keep
        |  WHERE EXISTS (SELECT 1 FROM h WHERE h.idx >= keep.idx + 5)
        |)
        |SELECT h.idx AS event_id, h.value AS value
        |FROM keep JOIN h ON keep.idx = h.idx
        |WHERE keep.idx IS NOT NULL""".stripMargin,
    // same censor walk, one recursion per user: the seed is each user's
    // first hit, every step jumps to that user's next hit >= last + width
    // (upstream CTEs MATERIALIZED — recursive rounds re-evaluate plain ones)
    "q_spike_censor_keyed" ->
      """WITH RECURSIVE t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |h AS MATERIALIZED (SELECT user_id, event_id AS idx, value FROM events, t WHERE value > thr),
        |keep(user_id, idx) AS (
        |  SELECT user_id, MIN(idx) FROM h GROUP BY user_id
        |  UNION ALL
        |  SELECT keep.user_id, (SELECT MIN(h.idx) FROM h WHERE h.user_id = keep.user_id AND h.idx >= keep.idx + 500)
        |  FROM keep
        |  WHERE EXISTS (SELECT 1 FROM h WHERE h.user_id = keep.user_id AND h.idx >= keep.idx + 500)
        |)
        |SELECT h.user_id AS user_id, h.idx AS event_id, h.value AS value
        |FROM keep JOIN h ON keep.user_id = h.user_id AND keep.idx = h.idx""".stripMargin,
    "q_align_linear" ->
      """WITH t AS (SELECT 2 * median(abs(value) / 0.6745) AS thr FROM events),
        |hits AS (SELECT event_id, value FROM events, t WHERE value > thr),
        |p AS (SELECT a.event_id AS peak_idx FROM hits a JOIN hits b ON a.event_id + 1 = b.event_id),
        |patch AS (SELECT p.peak_idx, e.event_id - p.peak_idx AS o, e.value AS v
        |          FROM events e JOIN p ON e.event_id >= p.peak_idx - 3 AND e.event_id < p.peak_idx + 3),
        |wf AS (SELECT peak_idx, list(v ORDER BY o) AS w FROM patch GROUP BY peak_idx
        |       HAVING COUNT(*) = 6),
        |pk AS (SELECT peak_idx, w,
        |         least(greatest(list_position(w, list_max(w)) - 1, 1), 4) AS i FROM wf),
        |pa AS (SELECT peak_idx, w, i,
        |         w[i] AS ym, w[i + 1] AS y0, w[i + 2] AS yp FROM pk),
        |fr AS (SELECT peak_idx, w,
        |         CASE WHEN ym - 2 * y0 + yp = 0 THEN CAST(i AS DOUBLE)
        |              ELSE i + 0.5 * (ym - yp) / (ym - 2 * y0 + yp) END AS frac
        |       FROM pa),
        |grid AS (SELECT peak_idx, w, frac,
        |           least(greatest(frac - 2 + j, 0), 5) AS x, j
        |         FROM fr, (SELECT unnest(generate_series(0, 3)) AS j)),
        |interp AS (SELECT peak_idx, j,
        |             w[CAST(floor(x) AS INT) + 1] +
        |             (x - floor(x)) * (w[least(CAST(floor(x) AS INT) + 2, 6)] - w[CAST(floor(x) AS INT) + 1]) AS v
        |           FROM grid)
        |SELECT peak_idx, j AS sample_idx, round(v, 6) AS value FROM interp""".stripMargin,
    // q_align: rows-only (cubic spline — numeric kernel, validated
    // against cross-implementation goldens in AlignSpec).
    "q_fir_smooth" -> {
      val fir = graft.dsp.Fir.firSql(firTaps, "value", "user_id", "event_id")
      s"""SELECT user_id, event_id, round($fir, 6) AS value FROM events"""
    },
    "q_decimate_fir" -> {
      val fir = graft.dsp.Fir.firSql(decTaps, "value", "user_id", "event_id")
      s"""WITH f AS (SELECT user_id, event_id, $fir AS fv FROM events),
         |r AS (SELECT user_id, event_id, fv,
         |        row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn
         |      FROM f)
         |SELECT user_id, event_id, round(fv, 6) AS value FROM r WHERE rn % $DecQ = 0""".stripMargin
    },
    // numeric-kernel oracles, GENERATED from the live kernel constants:
    // the IIR recurrence as recursive CTEs, the cubic-spline alignment
    // as unrolled MATERIALIZED stages. Every declared query is now
    // oracle-checked.
    "q_filtfilt" -> filtfiltOracleSql,
    // the chunked variant must produce the SAME values as the
    // whole-segment filter (sufficient overlap) — same oracle
    "q_filtfilt_chunked" -> filtfiltOracleSql,
    "q_global_sort" ->
      """SELECT row_number() OVER (ORDER BY epoch_us(ts), event_id) - 1 AS rank,
        |       event_id, epoch_us(ts) AS ts_us
        |FROM events""".stripMargin,
    "q_frange" ->
      """WITH b AS (SELECT user_id,
        |             least((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / CAST(1000000 AS DOUBLE),
        |                   CAST(20 AS DOUBLE)) AS stop
        |           FROM events GROUP BY user_id),
        |n AS (SELECT user_id, stop,
        |        CAST(floor(stop / CAST(0.37 AS DOUBLE)) AS BIGINT) AS num
        |      FROM b)
        |SELECT user_id, i, round(CAST(0 AS DOUBLE) + i * stop / num, 6) AS v
        |FROM n, unnest(generate_series(0, num - 1)) AS u(i)
        |WHERE num > 0""".stripMargin,
    "q_integrality" ->
      """SELECT CAST(COALESCE(SUM(CASE WHEN value % 1 <> 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_non_integral
        |FROM events""".stripMargin,
    "q_interval_join" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events),
         |d AS (SELECT ts_us, CASE WHEN ts_us - lag(ts_us) OVER (ORDER BY ts_us) >= $GlobalGapUs THEN 1 ELSE 0 END AS brk FROM e),
         |s AS (SELECT ts_us, SUM(brk) OVER (ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment_id FROM d),
         |g AS (SELECT CAST(segment_id AS BIGINT) AS segment_id, MIN(ts_us) AS start_us, MAX(ts_us) + 1 AS stop_us FROM s GROUP BY segment_id)
         |SELECT ev.event_id, epoch_us(ev.ts) AS ts_us, g.segment_id
         |FROM events ev JOIN g
         |  ON epoch_us(ev.ts) >= g.start_us AND epoch_us(ev.ts) < g.stop_us""".stripMargin,
    "q_align" -> alignOracleSql,
    // salting must be invisible in the result: the oracle is the PLAIN join
    "q_salted_join" ->
      """WITH d AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, d.n_events
        |FROM events e JOIN d ON e.user_id = d.user_id""".stripMargin,
    // pair set (the q_minhash_lsh pipeline) -> transitive closure ->
    // min label per component == the engine's label-propagation result
    "q_dedup_clusters" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |  sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |         FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |  seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |  hs AS (SELECT doc_id,
        |           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |           ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |         FROM sh),
        |  mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |         FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        |  bands AS (SELECT doc_id, seed // 4 AS band,
        |              string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |            FROM mh GROUP BY doc_id, seed // 4)
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |cc(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.src, cc.label FROM cc JOIN edges e ON e.dst = cc.doc_id
        |)
        |SELECT doc_id, MIN(label) AS cluster_id FROM cc GROUP BY doc_id""".stripMargin,
    "q_dedup_canonical" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |  sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |         FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |  seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |  hs AS (SELECT doc_id,
        |           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |           ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |         FROM sh),
        |  mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |         FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        |  bands AS (SELECT doc_id, seed // 4 AS band,
        |              string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |            FROM mh GROUP BY doc_id, seed // 4)
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |cc(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.src, cc.label FROM cc JOIN edges e ON e.dst = cc.doc_id
        |),
        |clusters AS (SELECT doc_id, MIN(label) AS cluster_id FROM cc GROUP BY doc_id),
        |scored AS (
        |  SELECT c.doc_id, c.cluster_id,
        |         round(CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE) / len(string_split(d.text, ' ')), 4) AS ttr
        |  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
        |ranked AS (
        |  SELECT doc_id, cluster_id,
        |         row_number() OVER (PARTITION BY cluster_id ORDER BY ttr DESC, doc_id ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, cluster_id, rk = 1 AS keep FROM ranked""".stripMargin,
    // documents.text is ASCII (asserted by the checker's schema gate at
    // every sf), so VARCHAR substring == byte slicing == Spark's binary
    // substring
    "q_frames" ->
      """WITH f AS (SELECT doc_id, length(text) // 64 AS n_frames, text FROM documents
        |           WHERE length(text) // 64 > 0),
        |g AS (SELECT doc_id, n_frames,
        |        unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx, text
        |      FROM f)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(frame_idx AS BIGINT) AS frame_idx,
        |       md5(substring(text, frame_idx * 64 + 1, 64)) AS frame_md5
        |FROM g""".stripMargin,
    "q_simhash_neardup" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |th AS (SELECT doc_id,
        |         ('0x' || substr(md5(t), 1, 8))::BIGINT AS th_hi,
        |         ('0x' || substr(md5(t), 9, 8))::BIGINT AS th_lo
        |       FROM tok),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN ((CASE WHEN b < 32 THEN th_lo ELSE th_hi END
        |                           >> (CASE WHEN b < 32 THEN b ELSE b - 32 END)) & 1) = 1
        |                    THEN 1 ELSE -1 END) AS s
        |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
        |         GROUP BY doc_id, b),
        |sig AS (SELECT doc_id,
        |  bit_or(CASE WHEN s > 0 THEN
        |           (CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << b) END)
        |         ELSE 0 END) AS simhash
        |FROM bits GROUP BY doc_id),
        |banded AS (SELECT doc_id, simhash, band, (simhash >> (16 * band)) & 65535 AS band_key
        |           FROM sig, (SELECT unnest(generate_series(0, 3)) AS band))
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "q_token_bpe" ->
      s"""WITH c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9${Text.WhitespaceClass}]+')) AS BIGINT) AS n_punct
        |FROM documents)
        |SELECT doc_id, n_alpha, n_num, n_punct,
        |       n_alpha + n_num + n_punct AS n_bpe_tokens,
        |       round(CAST(n_punct AS DOUBLE) / greatest(n_alpha + n_num + n_punct, 1), 4) AS punct_ratio
        |FROM c""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |         array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
        |m AS (SELECT s.doc_id, COUNT(*) AS n_overlap
        |      FROM sh s JOIN bench b USING (shingle)
        |      WHERE s.source <> 'src0' GROUP BY s.doc_id)
        |SELECT doc_id, n_overlap, CAST(n_overlap >= 5 AS INT) AS contaminated FROM m""".stripMargin,
    // the q_minhash_lsh band recipe with the src0 slice as the index
    // side: per corpus doc, how many of its 4 signature bands collide
    // with ANY benchmark doc's band
    "q_decontam_fuzzy" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |hs AS (SELECT doc_id, source,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |       FROM sh),
        |mh AS (SELECT doc_id, source, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |       FROM hs CROSS JOIN seeds GROUP BY doc_id, source, seed),
        |bands AS (SELECT doc_id, source, seed // 4 AS band,
        |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |          FROM mh GROUP BY doc_id, source, seed // 4),
        |bb AS (SELECT DISTINCT band, band_key FROM bands WHERE source = 'src0'),
        |cb AS (SELECT * FROM bands WHERE source <> 'src0')
        |SELECT cb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_bands
        |FROM cb JOIN bb ON cb.band = bb.band AND cb.band_key = bb.band_key
        |GROUP BY cb.doc_id""".stripMargin,
    // the verified variant: band collisions are candidates; the flag
    // needs >= 8 of 16 matching signature components (estimated
    // Jaccard >= 0.5) against some bench doc, reported as the best
    // match count (integer compare — cannot float-diverge)
    "q_decontam_fuzzy_verified" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
        |hs AS (SELECT doc_id, source,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
        |       FROM sh),
        |mh AS (SELECT doc_id, source, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
        |       FROM hs CROSS JOIN seeds GROUP BY doc_id, source, seed),
        |bands AS (SELECT doc_id, source, seed // 4 AS band,
        |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
        |          FROM mh GROUP BY doc_id, source, seed // 4),
        |bb AS (SELECT * FROM bands WHERE source = 'src0'),
        |cb AS (SELECT * FROM bands WHERE source <> 'src0'),
        |cand AS (SELECT DISTINCT cb.doc_id AS cid, bb.doc_id AS bid
        |         FROM cb JOIN bb ON cb.band = bb.band AND cb.band_key = bb.band_key),
        |ver AS (SELECT c.cid, c.bid,
        |          SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END) AS nmatch
        |        FROM cand c
        |        JOIN mh ma ON ma.doc_id = c.cid
        |        JOIN mh mb ON mb.doc_id = c.bid AND mb.seed = ma.seed
        |        GROUP BY c.cid, c.bid)
        |SELECT cid AS doc_id, CAST(MAX(nmatch) AS INT) AS best_matches
        |FROM ver WHERE nmatch >= 8 GROUP BY cid""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g1 AS (SELECT doc_id, t[i + 1] AS g FROM toks, unnest(generate_series(0, len(t) - 1)) AS u(i)),
        |c1 AS (SELECT doc_id, g, COUNT(*) AS c FROM g1 GROUP BY doc_id, g),
        |s1 AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS top, COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup FROM c1 GROUP BY doc_id),
        |g2 AS (SELECT doc_id, array_to_string(t[i + 1 : i + 2], ' ') AS g FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |s2 AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS top, COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS g FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
        |s3 AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS top, COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup FROM c3 GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(COALESCE(s1.total, 0) AS BIGINT) AS n_tokens,
        |       round(CAST(COALESCE(s1.dup, 0) AS DOUBLE) / greatest(COALESCE(s1.total, 0), 1), 4) AS dup_token_frac,
        |       round(CAST(COALESCE(s2.top, 0) AS DOUBLE) / greatest(COALESCE(s2.total, 0), 1), 4) AS top_2gram_frac,
        |       round(CAST(COALESCE(s2.dup, 0) AS DOUBLE) / greatest(COALESCE(s2.total, 0), 1), 4) AS dup_2gram_frac,
        |       round(CAST(COALESCE(s3.top, 0) AS DOUBLE) / greatest(COALESCE(s3.total, 0), 1), 4) AS top_3gram_frac,
        |       round(CAST(COALESCE(s3.dup, 0) AS DOUBLE) / greatest(COALESCE(s3.total, 0), 1), 4) AS dup_3gram_frac
        |FROM documents d
        |LEFT JOIN s1 ON s1.doc_id = d.doc_id
        |LEFT JOIN s2 ON s2.doc_id = d.doc_id
        |LEFT JOIN s3 ON s3.doc_id = d.doc_id""".stripMargin,
    "q_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 <
        |      CASE source WHEN 'src1' THEN 1.0 WHEN 'src2' THEN 0.75 WHEN 'src3' THEN 0.5
        |                  WHEN 'src4' THEN 0.25 WHEN 'src5' THEN 0.1 ELSE 0.0 END""".stripMargin,
    "q_shard_assign" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |        row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1 AS rk
        |      FROM d)
        |SELECT doc_id, n_tokens,
        |       CAST(CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - (rk % 8) END AS INT) AS shard
        |FROM r""".stripMargin,
    "q_stratified_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |             ('0x' || substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
        |           FROM documents),
        |r AS (SELECT doc_id, source,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY u ASC, doc_id ASC) AS INT) AS draw_rank
        |      FROM d)
        |SELECT doc_id, source, draw_rank FROM r WHERE draw_rank <= 25""".stripMargin,
    "q_temperature_sample" ->
      """WITH per AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |             FROM documents GROUP BY source),
        |mn AS (SELECT MIN(n_tokens) AS n_min FROM per),
        |rates AS (SELECT source, POWER(CAST(n_min AS DOUBLE) / CAST(n_tokens AS DOUBLE), 1.0 - 0.5) AS rate
        |          FROM per CROSS JOIN mn)
        |SELECT d.doc_id, d.source, ROUND(r.rate, 6) AS rate
        |FROM documents d JOIN rates r ON r.source = d.source
        |WHERE ('0x' || substr(md5('temp1' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 < r.rate""".stripMargin,
    "q_pack" ->
      """WITH d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |o AS (SELECT doc_id, source, n_tokens,
        |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |      FROM d)
        |SELECT doc_id, source, n_tokens, start_off,
        |       start_off // 512 AS seq_id, start_off % 512 AS seq_off FROM o""".stripMargin,
    // capacity above the gram universe => err = 0 => the sketch is pinned
    // by the exact operator's oracle
    "q_top_ngrams_sketch" -> topNgramsOracleSql,
    "q_top_ngrams" -> topNgramsOracleSql,
    "q_curate" ->
      """WITH toks AS (SELECT doc_id, text, source, string_split(text, ' ') AS t FROM documents),
        |q AS (SELECT doc_id, text, source, t,
        |        len(list_filter(t, x -> x IN ('the', 'a'))) / CAST(len(t) AS DOUBLE) AS stop_ratio,
        |        length(replace(text, ' ', '')) / CAST(len(t) AS DOUBLE) AS mwl
        |      FROM toks),
        |g2 AS (SELECT doc_id, array_to_string(t[i + 1 : i + 2], ' ') AS g FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |d2 AS (SELECT doc_id, CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS DOUBLE) / SUM(c) AS dup2 FROM c2 GROUP BY doc_id),
        |gated AS (SELECT q.doc_id, q.text, q.source, q.t FROM q LEFT JOIN d2 ON d2.doc_id = q.doc_id
        |          WHERE q.stop_ratio BETWEEN 0.02 AND 1.0 AND q.mwl BETWEEN 0.0 AND 5.0 AND COALESCE(d2.dup2, 0) <= 0.15),
        |sh AS (SELECT DISTINCT doc_id, source, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
        |cm AS (SELECT s.doc_id, COUNT(*) AS n_overlap FROM sh s JOIN bench b USING (shingle)
        |       WHERE s.source <> 'src0' AND s.doc_id IN (SELECT doc_id FROM gated) GROUP BY s.doc_id),
        |cleaned AS (SELECT * FROM gated WHERE source <> 'src0'
        |            AND doc_id NOT IN (SELECT doc_id FROM cm WHERE n_overlap >= 5)),
        |dd AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM cleaned),
        |samp AS (SELECT doc_id, source, t FROM dd WHERE rn = 1
        |         AND ('0x' || substr(md5('curate1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 <
        |             CASE source WHEN 'src1' THEN 1.0 WHEN 'src2' THEN 0.75 WHEN 'src3' THEN 0.5
        |                         WHEN 'src4' THEN 0.25 WHEN 'src5' THEN 0.1 ELSE 0.0 END),
        |p AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens,
        |        CAST(COALESCE(SUM(CAST(len(t) AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |      FROM samp)
        |SELECT doc_id, source, n_tokens, start_off,
        |       start_off // 512 AS seq_id, start_off % 512 AS seq_off FROM p""".stripMargin,
    "q_lm_score" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |nv AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cnt)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |       round(SUM(ln((c + 1) / (n + v))) / COUNT(*), 4) AS avg_logprob,
        |       round(exp(-SUM(ln((c + 1) / (n + v))) / COUNT(*)), 4) AS ppl
        |FROM toks t JOIN cnt USING (tok) CROSS JOIN nv
        |GROUP BY t.doc_id""".stripMargin,
    "q_lm_bigram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |u AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |c1 AS (SELECT tok, COUNT(*) AS c FROM u GROUP BY tok),
        |nv AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM c1),
        |pairs AS (SELECT doc_id, t[i] AS a, t[i + 1] AS b
        |          FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2)
        |SELECT p.doc_id, COUNT(*) AS n_bigrams,
        |       round(SUM(CASE WHEN c2.c2 IS NOT NULL THEN ln(c2.c2 / ca.c)
        |                 ELSE ln(0.4 * (cb.c + 1) / (n + v)) END) / COUNT(*), 4) AS avg_logscore,
        |       round(exp(-SUM(CASE WHEN c2.c2 IS NOT NULL THEN ln(c2.c2 / ca.c)
        |                 ELSE ln(0.4 * (cb.c + 1) / (n + v)) END) / COUNT(*)), 4) AS ppl
        |FROM pairs p
        |LEFT JOIN c2 ON p.a = c2.a AND p.b = c2.b
        |JOIN c1 ca ON p.a = ca.tok
        |JOIN c1 cb ON p.b = cb.tok
        |CROSS JOIN nv
        |GROUP BY p.doc_id""".stripMargin,
    "q_lm_trigram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |u AS (SELECT unnest(t) AS tok FROM toks),
        |c1 AS (SELECT tok, COUNT(*) AS c FROM u GROUP BY tok),
        |nv AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM c1),
        |b2 AS (SELECT array_to_string(t[i + 1 : i + 2], ' ') AS g
        |       FROM toks, unnest(generate_series(0, len(t) - 2)) AS s(i)),
        |c2 AS (SELECT g, COUNT(*) AS c2 FROM b2 GROUP BY g),
        |g3 AS (SELECT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS g,
        |        array_to_string(t[i + 1 : i + 2], ' ') AS gp,
        |        array_to_string(t[i + 2 : i + 3], ' ') AS gs,
        |        t[i + 2] AS bt, t[i + 3] AS ct
        |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS s(i)),
        |c3 AS (SELECT g, ANY_VALUE(gp) AS gp, ANY_VALUE(gs) AS gs,
        |        ANY_VALUE(bt) AS bt, ANY_VALUE(ct) AS ct, COUNT(*) AS c3
        |       FROM g3 GROUP BY g),
        |sc AS (SELECT c3.g,
        |        CASE WHEN c3.c3 >= 2 THEN ln(CAST(c3.c3 AS DOUBLE) / CAST(p.c2 AS DOUBLE))
        |             WHEN s2.c2 >= 2 THEN ln(0.4 * (CAST(s2.c2 AS DOUBLE) / CAST(cb.c AS DOUBLE)))
        |             ELSE ln(0.4 * (0.4 * ((CAST(cc.c AS DOUBLE) + 1.0) / (n + v))))
        |        END AS s
        |       FROM c3
        |       JOIN c2 p ON p.g = c3.gp
        |       JOIN c2 s2 ON s2.g = c3.gs
        |       JOIN c1 cb ON cb.tok = c3.bt
        |       JOIN c1 cc ON cc.tok = c3.ct
        |       CROSS JOIN nv)
        |SELECT g3.doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |  round(SUM(sc.s) / COUNT(*), 4) AS avg_logscore,
        |  round(exp(-SUM(sc.s) / COUNT(*)), 4) AS ppl
        |FROM g3 JOIN sc USING (g) GROUP BY g3.doc_id""".stripMargin,
    "q_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, i, array_to_string(t[i + 1 : i + 10], ' ') AS g
        |        FROM toks, unnest(generate_series(0, len(t) - 10)) AS u(i)),
        |dup AS (SELECT g FROM pos GROUP BY g HAVING COUNT(*) > 1),
        |ds AS (SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup)),
        |st AS (SELECT doc_id, COUNT(*) AS n_dup_starts FROM ds GROUP BY doc_id),
        |cov AS (SELECT doc_id, COUNT(*) AS n_covered FROM
        |          (SELECT DISTINCT doc_id, i + j AS p
        |           FROM ds, unnest(generate_series(0, 9)) AS v(j))
        |        GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(COALESCE(st.n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
        |       CAST(COALESCE(cov.n_covered, 0) AS BIGINT) AS n_covered,
        |       round(CAST(COALESCE(cov.n_covered, 0) AS DOUBLE) / len(string_split(d.text, ' ')), 4) AS dup_frac
        |FROM documents d
        |LEFT JOIN st ON st.doc_id = d.doc_id
        |LEFT JOIN cov ON cov.doc_id = d.doc_id""".stripMargin,
    "q_strip_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, i, array_to_string(t[i + 1 : i + 10], ' ') AS g
        |        FROM toks, unnest(generate_series(0, len(t) - 10)) AS u(i)),
        |dup AS (SELECT g FROM pos GROUP BY g HAVING COUNT(*) > 1),
        |ds AS (SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup)),
        |tok AS (SELECT doc_id, i - 1 AS idx, t[i] AS tok
        |        FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
        |kept AS (SELECT tok.doc_id, tok.idx, tok.tok FROM tok
        |         WHERE NOT EXISTS (SELECT 1 FROM ds
        |                           WHERE ds.doc_id = tok.doc_id
        |                             AND tok.idx >= ds.i AND tok.idx < ds.i + 10)),
        |ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean,
        |              COUNT(*) AS n_kept
        |       FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(ka.text_clean, '') AS text_clean,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(string_split(d.text, ' ')) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN ka ON ka.doc_id = d.doc_id""".stripMargin,
    "q_line_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |lin AS (SELECT doc_id, i AS ln, array_to_string(t[20*i+1 : 20*i+20], ' ') AS line
        |        FROM toks, unnest(generate_series(0, CAST(ceil(len(t)/20.0) AS BIGINT) - 1)) AS u(i)),
        |dup AS (SELECT line FROM lin GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
        |rm AS (SELECT doc_id, ln FROM lin WHERE line IN (SELECT line FROM dup)),
        |kept AS (SELECT l.doc_id, l.ln, l.line FROM lin l
        |         WHERE NOT EXISTS (SELECT 1 FROM rm WHERE rm.doc_id = l.doc_id AND rm.ln = l.ln)),
        |ka AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS text_clean,
        |              COUNT(*) AS n_kept
        |       FROM kept GROUP BY doc_id),
        |nl AS (SELECT doc_id, CAST(ceil(len(t)/20.0) AS BIGINT) AS n_lines FROM toks)
        |SELECT n.doc_id,
        |       COALESCE(ka.text_clean, '') AS text_clean,
        |       n.n_lines,
        |       CAST(n.n_lines - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_removed
        |FROM nl n LEFT JOIN ka ON ka.doc_id = n.doc_id""".stripMargin,
    "q_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(spark|table)\b')) AS BIGINT) AS n_blocked,
        |  regexp_replace(text, '\b(spark|table)\b', '[TERM]', 'g') AS redacted
        |FROM documents""".stripMargin,
    "q_bm25" -> bm25OracleSql,
    // identical parameters (and a spec-pinned identical plan contract)
    // ⇒ the serving probe shares the scan-form oracle
    "q_bm25_serve" -> bm25OracleSql,
    "q_token_budget" ->
      """WITH d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |        ('0x' || substr(md5('tb1' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
        |      FROM documents),
        |o AS (SELECT doc_id, source, n_tokens,
        |        COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM d)
        |SELECT doc_id, source, n_tokens FROM o WHERE cb < 600""".stripMargin,
    // textbook percent_rank window — the engine computes the identical
    // (rank−1)/(n−1) values from a (lang, score) histogram instead of a
    // per-language corpus sort (Text.percentileGate)
    "q_quality_gate" ->
      """WITH q AS (SELECT doc_id, lang,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS score
        |FROM documents),
        |r AS (SELECT doc_id, lang, score,
        |        percent_rank() OVER (PARTITION BY lang ORDER BY score) AS pr
        |      FROM q)
        |SELECT doc_id, lang, score, round(pr, 6) AS pct FROM r WHERE pr >= 0.5""".stripMargin,
    "q_json_extract" ->
      """WITH v AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
        |a AS (SELECT event_type, COUNT(*) AS n_rows, COUNT(k) AS n_parsed,
        |        CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_v
        |      FROM v GROUP BY event_type)
        |SELECT event_type, n_rows, n_parsed, sum_v,
        |  CASE WHEN n_parsed > 0 THEN round(CAST(sum_v AS DOUBLE) / n_parsed, 4) ELSE -1.0 END AS mean_v
        |FROM a""".stripMargin,
    // RRF fusion of the q_bm25 lexical chain (same CTEs/terms/rounding)
    // with the q_sim_topk cosine chain pinned to query vector 0; every
    // float literal CAST AS DOUBLE (bare 1.0 is DECIMAL in DuckDB)
    "q_hybrid_rrf" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |stats AS (SELECT COUNT(*) AS n, AVG(len(t)) AS avgdl FROM docs),
        |toks AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS tok FROM docs),
        |tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
        |       WHERE tok IN ('scan', 'join', 'vector', 'stream', 'merge', 'zzz')
        |       GROUP BY doc_id, dl, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tf) GROUP BY tok),
        |sc AS (SELECT doc_id, round(SUM(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2
        |                  / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS score
        |       FROM tf JOIN df USING (tok) CROSS JOIN stats GROUP BY doc_id),
        |lex AS (SELECT doc_id, lex_rank FROM
        |          (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank FROM sc)
        |        WHERE lex_rank <= 25),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |p AS (SELECT vec_id, qe, embedding AS ee FROM embeddings, q WHERE vec_id <> 0),
        |u AS (SELECT vec_id, unnest(qe) AS qv, unnest(ee) AS ev FROM p),
        |dd AS (SELECT vec_id,
        |         SUM(CAST(qv AS DOUBLE) * CAST(ev AS DOUBLE)) AS dp,
        |         SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS qq,
        |         SUM(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ee2
        |       FROM u GROUP BY vec_id),
        |cs AS (SELECT vec_id, round(dp / (sqrt(qq) * sqrt(ee2)), 6) AS cos_sim FROM dd),
        |dense AS (SELECT vec_id AS doc_id, dense_rank FROM
        |            (SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS dense_rank FROM cs)
        |          WHERE dense_rank <= 25),
        |f AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
        |        COALESCE(l.lex_rank, -1) AS lex_rank,
        |        COALESCE(d.dense_rank, -1) AS dense_rank,
        |        round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0)
        |              + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.dense_rank), 0), 6) AS rrf_score
        |      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
        |SELECT doc_id, lex_rank, dense_rank, rrf_score
        |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 15""".stripMargin,
    // same decomposed suffix (chr(769) = combining acute U+0301), same
    // op order: collapse space runs → lower → NFC compose
    "q_normalize" ->
      """SELECT doc_id,
        |  nfc_normalize(lower(regexp_replace(text || ' Cafe' || chr(769) || '  STRASSE', ' +', ' ', 'g'))) AS norm_text
        |FROM documents""".stripMargin,
    // SQ8: the only float step is quantization itself (plain IEEE double
    // ops, spelled identically); scoring is exact int64 so no rounding
    // convention is needed before the 6dp cosine round
    "q_sq8_topk" -> sq8OracleSql,
    // full probing => identical result, shared oracle (the q_ivf_topk /
    // q_ivf_serve recipe)
    "q_ivf_sq8" -> sq8OracleSql,
    // phase-major global row_number == the engine's two-pass
    // (phase, hash-bucket) rank: floor(u·n) is monotone in u, so bucket-
    // major + in-bucket (u, id) order IS (p, u, id) order
    "q_curriculum" ->
      """WITH q AS (SELECT doc_id, lang,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS score
        |FROM documents),
        |r AS (SELECT doc_id, lang, score,
        |        percent_rank() OVER (PARTITION BY lang ORDER BY score) AS pr
        |      FROM q),
        |m AS (SELECT 'main' AS phase, 0 AS p, doc_id FROM documents),
        |a AS (SELECT 'anneal' AS phase, 1 AS p, doc_id FROM r WHERE pr >= 0.5),
        |un AS (SELECT * FROM m UNION ALL SELECT * FROM a),
        |h AS (SELECT phase, p, doc_id,
        |        ('0x' || substr(md5('cur1' || phase || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
        |      FROM un)
        |SELECT phase, doc_id,
        |  row_number() OVER (ORDER BY p, u, doc_id) - 1 AS curriculum_rank
        |FROM h""".stripMargin,
    "q_pmi" ->
      """WITH docs AS (SELECT string_split(text, ' ') AS t FROM documents),
        |tot AS (SELECT CAST(SUM(len(t)) AS DOUBLE) AS n1, CAST(SUM(greatest(len(t) - 1, 0)) AS DOUBLE) AS n2 FROM docs),
        |uni AS (SELECT tok AS w, COUNT(*) AS c FROM (SELECT unnest(t) AS tok FROM docs) GROUP BY tok),
        |bi AS (SELECT array_to_string(t[i + 1 : i + 2], ' ') AS bigram
        |       FROM docs, unnest(generate_series(0, len(t) - 2)) AS u(i)),
        |bc AS (SELECT bigram, COUNT(*) AS c_ab FROM bi GROUP BY bigram HAVING COUNT(*) >= 5),
        |j AS (SELECT bc.bigram, bc.c_ab, ua.c AS c_a, ub.c AS c_b,
        |        round(ln((bc.c_ab / n2) / ((ua.c / n1) * (ub.c / n1))), 4) AS pmi
        |      FROM bc CROSS JOIN tot
        |      JOIN uni ua ON ua.w = string_split(bc.bigram, ' ')[1]
        |      JOIN uni ub ON ub.w = string_split(bc.bigram, ' ')[2])
        |SELECT bigram, c_ab, c_a, c_b, pmi FROM j ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin,
    "q_epochs" ->
      """SELECT doc_id, source, CAST(u.e AS INT) AS epoch
        |FROM documents,
        |  unnest(generate_series(0, CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
        |                                        WHEN 'src2' THEN -1 ELSE 0 END)) AS u(e)""".stripMargin,
    "q_gopher" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS type_token_ratio
        |FROM documents)
        |SELECT doc_id, n_tokens, mean_word_len, stopword_ratio, type_token_ratio,
        |  CAST(n_tokens >= 20 AND n_tokens <= 80
        |       AND mean_word_len >= 4.0 AND mean_word_len <= 10.0
        |       AND stopword_ratio >= 0.02 AND type_token_ratio >= 0.35 AS INT) AS passes
        |FROM s""".stripMargin,
    // same page shell appended on both sides; entity decode order is part
    // of the contract (&amp; last, so '&amp;lt;' decodes to '&lt;')
    "q_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><style>p { color: red }</style></head><body><p class="x">' || text ||
        |  ' &amp; more &lt;tags&gt; &quot;q&#39;</p><script>var x = 1;</script></body></html>' AS t
        |FROM documents),
        |s0 AS (SELECT doc_id, regexp_replace(t, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s1 AS (SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s0),
        |s2 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s1),
        |d AS (SELECT doc_id,
        |        replace(replace(replace(replace(replace(t,
        |          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
        |      FROM s2)
        |SELECT doc_id, trim(regexp_replace(t, ' +', ' ', 'g')) AS clean_text FROM d""".stripMargin,
    "q_chisq" -> chisqOracleSql,
    "q_benford" -> benfordOracleSql,
    "q_concentration" -> concentrationOracleSql,
    "q_ewma" -> ewmaOracleSql,
    "q_psi" -> psiOracleSql,
    "q_group_quantiles" ->
      """WITH e AS (SELECT event_type AS k, CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |c AS (SELECT k, v, COUNT(*) AS c FROM e GROUP BY k, v),
        |w AS (SELECT *, SUM(c) OVER (PARTITION BY k ORDER BY v) AS cum,
        |        SUM(c) OVER (PARTITION BY k) AS n FROM c)
        |SELECT k AS event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN cum * 2 >= n * 1 THEN v END) AS DOUBLE) AS p50,
        |  CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS DOUBLE) AS p90,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN v END) AS DOUBLE) AS p99
        |FROM w GROUP BY k""".stripMargin,
    "q_fk_orphans" ->
      """WITH pk AS (SELECT DISTINCT c_custkey AS fk FROM customer
        |      WHERE c_custkey % 7 <> 0 AND c_custkey IS NOT NULL),
        |j AS (SELECT o.o_custkey AS fk, pk.fk AS hit
        |      FROM orders o LEFT JOIN pk ON o.o_custkey = pk.fk),
        |a AS (SELECT COUNT(*) AS n, COUNT(fk) AS nn,
        |        COALESCE(SUM(CASE WHEN fk IS NOT NULL AND hit IS NULL
        |          THEN 1 ELSE 0 END), 0) AS orows,
        |        COUNT(DISTINCT CASE WHEN fk IS NOT NULL AND hit IS NULL
        |          THEN fk END) AS okeys
        |      FROM j)
        |SELECT CAST(n AS BIGINT) AS n_child, CAST(n - nn AS BIGINT) AS n_null_keys,
        |  CAST(orows AS BIGINT) AS n_orphan_rows, CAST(okeys AS BIGINT) AS n_orphan_keys,
        |  CASE WHEN nn > 0 THEN
        |    CAST((CAST(orows AS HUGEINT) * 1000000 * 2 + nn) // (CAST(nn AS HUGEINT) * 2)
        |         AS DOUBLE) / 1000000.0
        |  ELSE 0.0 END AS orphan_rate
        |FROM a""".stripMargin,
    "q_krippendorff" ->
      """WITH ann AS (
        |  SELECT vec_id AS item, 'r1' AS rater, 'l' || label AS label FROM embeddings
        |  UNION ALL SELECT vec_id, 'r2',
        |    'l' || (CASE WHEN vec_id % 5 = 0 THEN (label + 1) % 10 ELSE label END)
        |  FROM embeddings
        |  UNION ALL SELECT vec_id, 'r3',
        |    CASE WHEN vec_id % 7 = 0 THEN NULL ELSE 'l' || label END
        |  FROM embeddings),
        |cnt AS (SELECT item, label, COUNT(*) AS c FROM ann
        |        WHERE label IS NOT NULL GROUP BY 1, 2),
        |wm AS (SELECT *, SUM(c) OVER (PARTITION BY item) AS m,
        |        MIN(label) OVER (PARTITION BY item) AS ml FROM cnt),
        |fl AS (SELECT *, CASE WHEN label = ml THEN 1 ELSE 0 END AS fst
        |       FROM wm WHERE m >= 2),
        |pl AS (SELECT label, SUM(c) AS nl,
        |        SUM(CAST(c AS HUGEINT) * (c - 1) * (2520 // (m - 1))) AS agr,
        |        SUM(fst) AS items FROM fl GROUP BY label),
        |f AS (SELECT COALESCE(SUM(items), 0) AS n_items, COALESCE(SUM(nl), 0) AS n,
        |        COALESCE(SUM(agr), 0) AS agree,
        |        COALESCE(SUM(CAST(nl AS HUGEINT) * nl), 0) AS sumsq FROM pl),
        |g AS (SELECT *, CAST(n AS HUGEINT) * 2520 AS nl2520,
        |        CAST(n AS HUGEINT) * n - sumsq AS denum,
        |        CAST(n AS HUGEINT) * (n - 1) AS deden FROM f)
        |SELECT CAST(n_items AS BIGINT) AS n_items, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n > 0 THEN
        |    CAST(((nl2520 - agree) * 1000000 * 2 + nl2520) // (nl2520 * 2) AS DOUBLE)
        |      / 1000000.0 END AS "do",
        |  CASE WHEN n > 1 THEN
        |    CAST((denum * 1000000 * 2 + deden) // (deden * 2) AS DOUBLE)
        |      / 1000000.0 END AS de,
        |  CASE WHEN denum > 0 THEN
        |    CAST(CASE WHEN nl2520 * denum - (nl2520 - agree) * deden >= 0 THEN
        |        ((nl2520 * denum - (nl2520 - agree) * deden) * 1000000 * 2
        |          + nl2520 * denum) // (nl2520 * denum * 2)
        |      ELSE
        |        -((((nl2520 - agree) * deden - nl2520 * denum) * 1000000 * 2
        |          + nl2520 * denum) // (nl2520 * denum * 2))
        |      END AS DOUBLE) / 1000000.0 END AS alpha
        |FROM g""".stripMargin,
    "q_growth" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events),
        |pr AS (SELECT DISTINCT u,
        |        CAST((t - t % 86400000000) / 86400000000 AS BIGINT) AS period FROM e),
        |c AS (SELECT *, lag(period) OVER (PARTITION BY u ORDER BY period) AS prev FROM pr),
        |cl AS (SELECT period,
        |        CASE WHEN prev IS NULL THEN 'new'
        |             WHEN prev = period - 1 THEN 'retained'
        |             ELSE 'resurrected' END AS cls FROM c),
        |pp AS (SELECT period, COUNT(*) AS n_active,
        |        SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
        |        SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS n_retained,
        |        SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
        |      FROM cl GROUP BY period),
        |f AS (SELECT *, CASE WHEN lag(period) OVER (ORDER BY period) = period - 1
        |        THEN lag(n_active) OVER (ORDER BY period) ELSE 0 END AS pa FROM pp)
        |SELECT period, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(n_new AS BIGINT) AS n_new, CAST(n_retained AS BIGINT) AS n_retained,
        |  CAST(n_resurrected AS BIGINT) AS n_resurrected,
        |  CAST(pa - n_retained AS BIGINT) AS n_churned,
        |  CASE WHEN pa > 0 THEN
        |    CAST((CAST(pa - n_retained AS HUGEINT) * 2000000 + pa) // (CAST(pa AS HUGEINT) * 2)
        |         AS DOUBLE) / 1000000.0 END AS churn_rate
        |FROM f""".stripMargin,
    "q_growth_dense" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events),
        |fe AS (SELECT u, t FROM e
        |       WHERE CAST((t - t % 86400000000) / 86400000000 AS BIGINT) % 3 <> 1),
        |pr AS (SELECT DISTINCT u,
        |        CAST((t - t % 86400000000) / 86400000000 AS BIGINT) AS period FROM fe),
        |c AS (SELECT *, lag(period) OVER (PARTITION BY u ORDER BY period) AS prev FROM pr),
        |cl AS (SELECT period,
        |        CASE WHEN prev IS NULL THEN 'new'
        |             WHEN prev = period - 1 THEN 'retained'
        |             ELSE 'resurrected' END AS cls FROM c),
        |pp AS (SELECT period, COUNT(*) AS n_active,
        |        SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
        |        SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS n_retained,
        |        SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
        |      FROM cl GROUP BY period),
        |sp AS (SELECT unnest(generate_series((SELECT min(period) FROM pp),
        |                                     (SELECT max(period) FROM pp))) AS period),
        |d AS (SELECT sp.period,
        |        coalesce(pp.n_active, 0) AS n_active, coalesce(pp.n_new, 0) AS n_new,
        |        coalesce(pp.n_retained, 0) AS n_retained,
        |        coalesce(pp.n_resurrected, 0) AS n_resurrected
        |      FROM sp LEFT JOIN pp ON sp.period = pp.period),
        |f AS (SELECT *, coalesce(lag(n_active) OVER (ORDER BY period), 0) AS pa FROM d)
        |SELECT period, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(n_new AS BIGINT) AS n_new, CAST(n_retained AS BIGINT) AS n_retained,
        |  CAST(n_resurrected AS BIGINT) AS n_resurrected,
        |  CAST(pa - n_retained AS BIGINT) AS n_churned,
        |  CASE WHEN pa > 0 THEN
        |    CAST((CAST(pa - n_retained AS HUGEINT) * 2000000 + pa) // (CAST(pa AS HUGEINT) * 2)
        |         AS DOUBLE) / 1000000.0 END AS churn_rate
        |FROM f""".stripMargin,
    "q_dau" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events),
        |pr AS (SELECT DISTINCT u,
        |        CAST((t - t % 86400000000) / 86400000000 AS BIGINT) AS day FROM e),
        |dau AS (SELECT day, COUNT(*) AS dau FROM pr GROUP BY day),
        |ex AS (SELECT DISTINCT u, day + k AS day FROM pr
        |       CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k)),
        |wau AS (SELECT day, COUNT(*) AS wau FROM ex GROUP BY day)
        |SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
        |  CAST((CAST(d.dau AS HUGEINT) * 2000000 + w.wau)
        |       // (CAST(w.wau AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.day""".stripMargin,
    "q_class_weights" ->
      """WITH l AS (SELECT 'l' || label AS label FROM embeddings),
        |c AS (SELECT label, COUNT(*) AS n FROM l GROUP BY label),
        |w AS (SELECT *, SUM(n) OVER () AS total, COUNT(*) OVER () AS k FROM c)
        |SELECT label, CAST(n AS BIGINT) AS n,
        |  CAST((CAST(n AS HUGEINT) * 2000000 + total)
        |       // (CAST(total AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS share,
        |  CAST((CAST(total AS HUGEINT) * 2000000 + k * n)
        |       // (CAST(k AS HUGEINT) * n * 2) AS DOUBLE) / 1000000.0 AS weight
        |FROM w""".stripMargin,
    "q_ari" ->
      """WITH p AS (SELECT
        |    'c' || (CASE WHEN vec_id % 5 = 0 THEN (label + 1) % 10 ELSE label END) AS c,
        |    'l' || label AS l FROM embeddings),
        |cm AS (SELECT c, l, COUNT(*) AS n FROM p GROUP BY c, l),
        |g AS (SELECT *, SUM(n) OVER (PARTITION BY c) AS a,
        |        SUM(n) OVER (PARTITION BY l) AS b, SUM(n) OVER () AS nn,
        |        MIN(l) OVER (PARTITION BY c) AS minl,
        |        MIN(c) OVER (PARTITION BY l) AS minc,
        |        row_number() OVER (PARTITION BY c ORDER BY n DESC, l DESC) AS rn
        |      FROM cm),
        |f AS (SELECT nn, COUNT(DISTINCT c) AS ncl, COUNT(DISTINCT l) AS nlb,
        |        SUM(CASE WHEN rn = 1 THEN n ELSE 0 END) AS pure,
        |        SUM(CAST(n AS HUGEINT) * (n - 1)) AS s2,
        |        SUM(CASE WHEN l = minl THEN CAST(a AS HUGEINT) * (a - 1) ELSE 0 END) AS a2,
        |        SUM(CASE WHEN c = minc THEN CAST(b AS HUGEINT) * (b - 1) ELSE 0 END) AS b2
        |      FROM g GROUP BY nn),
        |h AS (SELECT *,
        |        s2 * (CAST(nn AS HUGEINT) * (nn - 1)) * 2 - a2 * b2 * 2 AS num,
        |        CAST(nn AS HUGEINT) * (nn - 1) * (a2 + b2) - a2 * b2 * 2 AS den FROM f),
        |h2 AS (SELECT *, CASE WHEN den < 0 THEN -num ELSE num END AS snum,
        |        abs(den) AS sden FROM h)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(ncl AS BIGINT) AS n_clusters,
        |  CAST(nlb AS BIGINT) AS n_labels,
        |  CAST((CAST(pure AS HUGEINT) * 1000000 * 2 + nn)
        |       // (CAST(nn AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS purity,
        |  CASE WHEN den <> 0 THEN
        |    CAST(CASE WHEN snum >= 0 THEN (snum * 1000000 * 2 + sden) // (sden * 2)
        |         ELSE -(((-snum) * 1000000 * 2 + sden) // (sden * 2)) END AS DOUBLE)
        |      / 1000000.0 END AS ari
        |FROM h2""".stripMargin,
    "q_seasonal" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |      FROM events WHERE value IS NOT NULL),
        |e2 AS (SELECT *, (ts_us // 3600000000) % 24 AS phase FROM e),
        |p AS (SELECT event_type, phase, COUNT(*) AS n_phase,
        |        (SUM(c) * 10000 * 2 + COUNT(*)) // (COUNT(*) * 2) AS mm
        |      FROM e2 GROUP BY 1, 2)
        |SELECT e2.event_id, e2.event_type, e2.ts_us, e2.phase,
        |  CAST(p.n_phase AS BIGINT) AS n_phase,
        |  CAST(mm AS DOUBLE) / 1000000.0 AS expected,
        |  CAST(c * 10000 - mm AS DOUBLE) / 1000000.0 AS residual,
        |  CAST(abs(c * 10000 - mm) > 150000000 AS INT) AS alarm
        |FROM e2 JOIN p ON e2.event_type = p.event_type AND e2.phase = p.phase""".stripMargin,
    "q_sprt" -> sprtOracleSql,
    "q_rules" -> rulesOracleSql,
    "q_embed_audit" ->
      """WITH e AS (SELECT embedding AS v FROM embeddings),
        |c AS (SELECT v,
        |        CASE WHEN v IS NULL THEN NULL
        |             ELSE list_reduce(list_transform(v, x -> CAST(x AS DOUBLE) * x),
        |                              (a, b) -> a + b) END AS sq,
        |        CASE WHEN v IS NULL THEN FALSE
        |             ELSE len(list_filter(v,
        |                    x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 END AS bad
        |      FROM e),
        |f AS (SELECT *, v IS NOT NULL AND len(v) = 64 AND NOT bad AS clean,
        |        round(sqrt(sq), 6) AS nrm FROM c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(SUM(CASE WHEN v IS NOT NULL AND len(v) <> 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_wrong_dim,
        |  CAST(SUM(CASE WHEN v IS NOT NULL AND bad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonfinite,
        |  CAST(SUM(CASE WHEN clean AND sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  MIN(CASE WHEN clean THEN nrm END) AS norm_min,
        |  MAX(CASE WHEN clean THEN nrm END) AS norm_max,
        |  CASE WHEN SUM(CASE WHEN clean THEN 1 ELSE 0 END) > 0 THEN
        |    CAST((SUM(CASE WHEN clean THEN CAST(round(nrm * 1000000, 0) AS HUGEINT) END) * 2
        |          + SUM(CASE WHEN clean THEN 1 ELSE 0 END))
        |         // (CAST(SUM(CASE WHEN clean THEN 1 ELSE 0 END) AS HUGEINT) * 2) AS DOUBLE)
        |      / 1000000.0 END AS norm_mean
        |FROM f""".stripMargin,
    "q_step_timing" ->
      """WITH e AS (SELECT user_id AS u, event_type AS s, epoch_us(ts) AS t FROM events),
        |f AS (SELECT u, MIN(CASE WHEN s = 'signup' THEN t END) AS ft
        |      FROM e WHERE s IN ('signup', 'purchase') GROUP BY u),
        |f2 AS (SELECT * FROM f WHERE ft IS NOT NULL),
        |tt AS (SELECT e.u, MIN(e.t) AS tt FROM e JOIN f2 ON e.u = f2.u
        |       WHERE e.s = 'purchase' AND e.t >= f2.ft GROUP BY e.u),
        |d AS (SELECT f2.u, tt.tt - f2.ft AS d FROM f2 LEFT JOIN tt ON f2.u = tt.u),
        |c AS (SELECT d, COUNT(*) AS c FROM d GROUP BY d),
        |w AS (SELECT *, d IS NOT NULL AS conv,
        |        SUM(CASE WHEN d IS NOT NULL THEN c ELSE 0 END) OVER (ORDER BY d) AS cum,
        |        SUM(CASE WHEN d IS NOT NULL THEN c ELSE 0 END) OVER () AS nconv,
        |        SUM(c) OVER () AS nfrom FROM c)
        |SELECT CAST(nfrom AS BIGINT) AS n_from, CAST(nconv AS BIGINT) AS n_converted,
        |  MIN(CASE WHEN conv AND cum * 2 >= nconv * 1 THEN d END) AS p50_us,
        |  MIN(CASE WHEN conv AND cum * 10 >= nconv * 9 THEN d END) AS p90_us,
        |  MIN(CASE WHEN conv AND cum * 100 >= nconv * 99 THEN d END) AS p99_us
        |FROM w GROUP BY nfrom, nconv""".stripMargin,
    "q_linear_fit" ->
      """WITH e AS (SELECT event_type AS k,
        |    CAST(CAST((epoch_us(ts) - 1704067200000000
        |               - (epoch_us(ts) - 1704067200000000) % 3600000000)
        |              / 3600000000 AS BIGINT) AS DECIMAL(18,6)) AS x,
        |    CAST(value AS DECIMAL(18,2)) AS y FROM events),
        |a AS (SELECT k, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |      FROM e GROUP BY k),
        |f AS (SELECT *,
        |        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
        |      FROM a)
        |SELECT k AS event_type, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN varxn > 0 THEN covn / varxn END, 6) AS slope,
        |  round(CASE WHEN varxn > 0 THEN
        |    (CAST(sy AS DOUBLE) - (covn / varxn) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |  END, 6) AS intercept,
        |  round(CASE WHEN varxn > 0 AND varyn > 0
        |    THEN covn * covn / (varxn * varyn) END, 6) AS r2
        |FROM f""".stripMargin,
    "q_entropy" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
        |w AS (SELECT *, SUM(c) OVER (PARTITION BY source) AS n,
        |        COUNT(*) OVER (PARTITION BY source) AS k FROM c),
        |t AS (SELECT *, CAST(round(
        |        -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 12)
        |        AS DECIMAL(38,12)) AS tt FROM w),
        |f AS (SELECT source, n, k, SUM(tt) AS h FROM t GROUP BY source, n, k)
        |SELECT source, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_distinct,
        |  round(CAST(h AS DOUBLE), 6) AS entropy,
        |  round(CASE WHEN k > 1 THEN CAST(h AS DOUBLE) / ln(CAST(k AS DOUBLE)) END, 6)
        |    AS norm_entropy
        |FROM f""".stripMargin
  ) ++ pqFamilyOracles

  /** q_sprt: the same pinned 10⁻⁶ log-literal chain — llr linear in
    * the counts, Wald boundaries as integer compares. */
  private lazy val sprtOracleSql: String = {
    val l1 = math.round(math.log(0.25 / 0.15) * 1e6)
    val l0 = math.round(math.log(0.75 / 0.85) * 1e6)
    val upper = math.round(math.log((1 - 0.2) / 0.05) * 1e6)
    val lower = math.round(math.log(0.2 / (1 - 0.05)) * 1e6)
    s"""WITH e AS (SELECT 'arm' || CAST(user_id % 3 AS VARCHAR) AS variant,
       |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv FROM events),
       |a AS (SELECT variant, COUNT(*) AS n, SUM(conv) AS conv FROM e GROUP BY variant),
       |l AS (SELECT *, conv * $l1 + (n - conv) * $l0 AS llr FROM a)
       |SELECT variant, CAST(n AS BIGINT) AS n, CAST(conv AS BIGINT) AS conv,
       |  CAST(llr AS DOUBLE) / 1000000.0 AS llr,
       |  CASE WHEN llr >= $upper THEN 'accept_h1'
       |       WHEN llr <= $lower THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM l""".stripMargin
  }

  /** q_rules: the naive self-join respelling over the same basket
    * universe — pairs by b1.i < b2.i equi-join, supports and N from
    * the identical [2, max]-sized distinct-item baskets, ratios as
    * the same half-up integral divisions. */
  private lazy val rulesOracleSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey AS b,
      |        'p' || CAST(l_partkey % 200 AS VARCHAR) AS i FROM lineitem),
      |sz AS (SELECT b, COUNT(*) AS n FROM it GROUP BY b),
      |ok AS (SELECT b FROM sz WHERE n BETWEEN 2 AND 20),
      |bi AS (SELECT it.b, it.i FROM it JOIN ok USING (b)),
      |nb AS (SELECT COUNT(*) AS nn FROM ok),
      |sup AS (SELECT i, COUNT(*) AS ni FROM bi GROUP BY i),
      |pr AS (SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS n_ab
      |       FROM bi a JOIN bi b2 ON a.b = b2.b AND a.i < b2.i
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(sa.ni AS BIGINT) AS n_a, CAST(sb.ni AS BIGINT) AS n_b,
      |  CAST((CAST(n_ab AS HUGEINT) * 1000000 * 2 + sa.ni)
      |       // (CAST(sa.ni AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS conf_ab,
      |  CAST((CAST(n_ab AS HUGEINT) * 1000000 * 2 + sb.ni)
      |       // (CAST(sb.ni AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS conf_ba,
      |  CAST((CAST(n_ab AS HUGEINT) * nn * 1000000 * 2 + sa.ni * sb.ni)
      |       // (CAST(sa.ni AS HUGEINT) * sb.ni * 2) AS DOUBLE) / 1000000.0 AS lift
      |FROM pr
      |JOIN sup sa ON pr.item_a = sa.i
      |JOIN sup sb ON pr.item_b = sb.i
      |CROSS JOIN nb""".stripMargin

  /** q_psi: baseline-decile bins from the exact integer
    * ⌊(cumA−1)·10/nA⌋ clamp on the shared two-sample value rollup;
    * per-bin (pa−pb)·ln(pa/pb) terms with 10⁻⁶ clamping through the
    * tokenDrift 12dp-round → DECIMAL(38,12) exact-sum recipe; alert
    * on the decimal sum vs the 0.2 literal. */
  private lazy val psiOracleSql: String =
    s"""$twoSampleCte,
       |bb AS (SELECT greatest(0, least(9, (cuma - 1) * 10 // na)) AS bin,
       |        na, nb, ca, cb FROM c),
       |rb AS (SELECT bin, na, nb, SUM(ca) AS nna, SUM(cb) AS nnb
       |      FROM bb GROUP BY bin, na, nb),
       |tp AS (SELECT *,
       |        greatest(CAST(nna AS DOUBLE) / na, 1e-6) AS pac,
       |        greatest(CAST(nnb AS DOUBLE) / nb, 1e-6) AS pbc
       |      FROM rb),
       |dd AS (SELECT *, CAST(round((pac - pbc) * ln(pac / pbc), 12) AS DECIMAL(38,12)) AS tt
       |      FROM tp),
       |f AS (SELECT *, SUM(tt) OVER () AS psid FROM dd)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(nna AS BIGINT) AS na, CAST(nnb AS BIGINT) AS nb,
       |  round(CAST(nna AS DOUBLE) / na, 6) AS pa,
       |  round(CAST(nnb AS DOUBLE) / nb, 6) AS pb,
       |  round(CAST(tt AS DOUBLE), 6) AS term,
       |  round(CAST(psid AS DOUBLE), 6) AS psi,
       |  CAST(psid > 0.200000000000::DECIMAL(38,12) AS INT) AS alert
       |FROM f""".stripMargin

  /** q_chisq: the join-free contingency replayed — window marginals
    * over observed cells, each observed χ² term the exact half-up
    * (o·N − ra·cb)²·10⁶ / (ra·cb·N), the zero-cell collective term
    * (N² − Σobs ra·cb)/N, reject and Cochran validity as pure integer
    * compares on min(ra)·min(cb). */
  private lazy val chisqOracleSql: String =
    """WITH e AS (SELECT event_type AS a, 'u' || CAST(user_id % 4 AS VARCHAR) AS b FROM events),
      |cl AS (SELECT a, b, COUNT(*) AS o FROM e GROUP BY a, b),
      |g AS (SELECT *, SUM(o) OVER (PARTITION BY a) AS ra,
      |        SUM(o) OVER (PARTITION BY b) AS cb, SUM(o) OVER () AS n FROM cl),
      |t AS (SELECT *, CAST(ra AS HUGEINT) * cb AS e38,
      |        CAST(o AS HUGEINT) * n - CAST(ra AS HUGEINT) * cb AS d FROM g),
      |c AS (SELECT *, (d * d * 1000000 * 2 + e38 * n) // (e38 * n * 2) AS contrib FROM t),
      |f AS (SELECT n, COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c2,
      |        SUM(contrib) AS om, SUM(e38) AS emass,
      |        MIN(ra) AS minra, MIN(cb) AS mincb FROM c GROUP BY n),
      |f2 AS (SELECT *,
      |        om + ((CAST(n AS HUGEINT) * n - emass) * 1000000 * 2 + n)
      |             // (CAST(n AS HUGEINT) * 2) AS chi2m,
      |        CAST(minra AS HUGEINT) * mincb AS mine FROM f)
      |SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_rows,
      |  CAST(c2 AS BIGINT) AS n_cols, CAST((r - 1) * (c2 - 1) AS BIGINT) AS dof,
      |  CAST(chi2m AS DOUBLE) / 1000000.0 AS chi2,
      |  CAST(chi2m > 21026000 AS INT) AS reject,
      |  CAST((mine * 1000000 * 2 + n) // (CAST(n AS HUGEINT) * 2) AS DOUBLE) / 1000000.0
      |    AS min_expected,
      |  CAST(mine >= CAST(n AS HUGEINT) * 5 AS INT) AS valid
      |FROM f2""".stripMargin

  /** q_benford: digit from the cent integer's string form, the same
    * pinned 10⁻⁶ expected-share literals, densified 1…9 frame, χ²
    * terms and total as exact half-up micro integers. */
  private lazy val benfordOracleSql: String = {
    val vals = graft.ops.Stats.benfordMicro.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p}::HUGEINT)" }.mkString(", ")
    s"""WITH v AS (SELECT CAST(abs(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS c
       |        FROM lineitem),
       |d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit FROM v WHERE c > 0),
       |cnt AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
       |p AS (SELECT * FROM (VALUES $vals) AS t(digit, pm)),
       |g AS (SELECT p.digit, pm, COALESCE(n, 0) AS n FROM p LEFT JOIN cnt ON p.digit = cnt.digit),
       |g2 AS (SELECT *, SUM(n) OVER () AS total FROM g),
       |t AS (SELECT *, pm * total AS pn,
       |        CAST(n AS HUGEINT) * 1000000 - pm * total AS dd FROM g2),
       |c AS (SELECT *, (dd * dd * 2 + pn) // (pn * 2) AS contrib,
       |        (CAST(n AS HUGEINT) * 1000000 * 2 + total) // (CAST(total AS HUGEINT) * 2) AS sharem
       |      FROM t),
       |f AS (SELECT *, SUM(contrib) OVER () AS chi2m FROM c)
       |SELECT digit, CAST(n AS BIGINT) AS n,
       |  CAST(sharem AS DOUBLE) / 1000000.0 AS share,
       |  CAST(pm AS DOUBLE) / 1000000.0 AS expected_share,
       |  CAST(pn AS DOUBLE) / 1000000.0 AS expected,
       |  CAST(contrib AS DOUBLE) / 1000000.0 AS contrib,
       |  CAST(chi2m AS DOUBLE) / 1000000.0 AS chi2
       |FROM f""".stripMargin
  }

  /** q_concentration: ascending (count, key) rank fold — Gini's exact
    * rank form, HHI, top-10 share, each a sign-aware half-up integral
    * division of exact HUGEINT rationals. */
  private lazy val concentrationOracleSql: String =
    """WITH c AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY user_id),
      |r AS (SELECT *, row_number() OVER (ORDER BY c ASC, k ASC) AS i,
      |        COUNT(*) OVER () AS nk, SUM(c) OVER () AS tot FROM c),
      |a AS (SELECT nk, tot,
      |        SUM((CAST(i AS HUGEINT) * 2 - nk - 1) * c) AS gnum,
      |        SUM(CAST(c AS HUGEINT) * c) AS c2,
      |        SUM(CASE WHEN i > nk - 10 THEN c ELSE 0 END) AS top
      |      FROM r GROUP BY nk, tot)
      |SELECT CAST(nk AS BIGINT) AS n_keys, CAST(tot AS BIGINT) AS total,
      |  CAST(CASE WHEN gnum >= 0
      |       THEN (gnum * 1000000 * 2 + CAST(nk AS HUGEINT) * tot)
      |            // (CAST(nk AS HUGEINT) * tot * 2)
      |       ELSE -(((-gnum) * 1000000 * 2 + CAST(nk AS HUGEINT) * tot)
      |            // (CAST(nk AS HUGEINT) * tot * 2)) END AS DOUBLE) / 1000000.0 AS gini,
      |  CAST((c2 * 1000000 * 2 + CAST(tot AS HUGEINT) * tot)
      |       // (CAST(tot AS HUGEINT) * tot * 2) AS DOUBLE) / 1000000.0 AS hhi,
      |  CAST((CAST(top AS HUGEINT) * 1000000 * 2 + tot)
      |       // (CAST(tot AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS topk_share
      |FROM a""".stripMargin

  /** q_ewma: the 8-tap truncated EWMA unrolled — exact integer tap
    * weights over cent values, sign-aware half-up micro division,
    * deviation vs the lagged smoothed value, integer-compare alarm. */
  private lazy val ewmaOracleSql: String = {
    val ws = graft.ts.Ewma.weights(8, 1, 4)
    val lagCols = (1 to 7).map(k => s"lag(c, $k) OVER w AS c$k").mkString(",\n        ")
    val num = (s"${ws.head} * c" +:
      (1 to 7).map(k => s"${ws(k)} * COALESCE(c$k, 0)")).mkString(" + ")
    val den = (s"${ws.head}" +:
      (1 to 7).map(k => s"CASE WHEN c$k IS NULL THEN 0 ELSE ${ws(k)} END")).mkString(" + ")
    val nt = ("1" +:
      (1 to 7).map(k => s"CASE WHEN c$k IS NULL THEN 0 ELSE 1 END")).mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |      FROM events WHERE value IS NOT NULL),
       |l AS (SELECT *, $lagCols
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |m AS (SELECT *, $num AS num, $den AS den, $nt AS nt FROM l),
       |s AS (SELECT *, CASE WHEN num >= 0
       |        THEN (CAST(num AS HUGEINT) * 10000 * 2 + den) // (CAST(den AS HUGEINT) * 2)
       |        ELSE -((CAST(-num AS HUGEINT) * 10000 * 2 + den) // (CAST(den AS HUGEINT) * 2))
       |        END AS em FROM m),
       |f AS (SELECT *, lag(em, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pm
       |      FROM s)
       |SELECT event_id, user_id, ts_us, CAST(nt AS INT) AS n_taps,
       |  CAST(em AS DOUBLE) / 1000000.0 AS ewma,
       |  CAST(CAST(c AS HUGEINT) * 10000 - pm AS DOUBLE) / 1000000.0 AS dev,
       |  CAST(COALESCE(abs(CAST(c AS HUGEINT) * 10000 - pm) > 200000000, FALSE) AS INT) AS alarm
       |FROM f""".stripMargin
  }

  /** q_psd: the FFT kernel's bins recomputed with an UNROLLED direct
    * DFT — literal cos/sin constants generated from the same driver
    * arithmetic (the lshBucketSql recipe), every literal CAST AS DOUBLE.
    * Powers compare on round(log10(p + 1), 4): on the log scale the
    * butterflies-vs-direct-sums float discrepancy is ~1e-16, far from
    * any rounding boundary. */
  /** Shared generator for the spectral oracles: unrolled-DFT aggregates
    * over a caller-supplied window-membership CTE (literal trig
    * constants from the same driver arithmetic as the engine's
    * reference DFT — the lshBucketSql recipe). */
  private def dftOracle(n: Int, wCte: String, finalBranches: Int => String): String = {
    def cs(j: Int, k: Int): Double = math.cos(-2.0 * math.Pi * j * k / n)
    def sn(j: Int, k: Int): Double = math.sin(-2.0 * math.Pi * j * k / n)
    def trigSum(k: Int, f: (Int, Int) => Double): String = {
      val cases = (0 until n)
        .map(j => s"WHEN $j THEN CAST(${f(j, k)} AS DOUBLE)")
        .mkString(" ")
      s"SUM(value * (CASE j $cases END))"
    }
    val aggs = (0 to n / 2).flatMap { k =>
      Seq(s"${trigSum(k, cs)} AS re$k", s"${trigSum(k, sn)} AS im$k")
    }.mkString(",\n        ")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
r AS (SELECT user_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - 1 AS rn
      FROM e),
$wCte,
g AS (SELECT user_id, win, COUNT(*) AS nn,
        $aggs
      FROM w GROUP BY user_id, win),
f AS (SELECT * FROM g WHERE nn = $n)
${finalBranches(n)}"""
  }

  private def psdBinBranches(n: Int): String =
    (0 to n / 2).map { k =>
      s"SELECT user_id, win, $k AS bin, round(log10(re$k * re$k + im$k * im$k + 1), 4) AS log_power FROM f"
    }.mkString("\nUNION ALL\n")

  private lazy val psdOracleSql: String =
    dftOracle(8,
      "w AS (SELECT user_id, rn // 8 AS win, CAST(rn % 8 AS INT) AS j, value FROM r)",
      psdBinBranches)

  /** q_stft: 8-sample windows hopped by 4 (Welch 50 % overlap) — the
    * membership generator spelled with explicit double floor (DuckDB's
    * `//` truncation vs floor on negatives must not enter the picture). */
  private lazy val stftOracleSql: String =
    dftOracle(8,
      """w AS (SELECT user_id, u.win AS win, CAST(rn - u.win * 4 AS INT) AS j, value
      FROM r, unnest(generate_series(
        greatest(0, -CAST(floor((7 - rn) / 4.0) AS BIGINT)),
        rn // 4)) AS u(win))""",
      psdBinBranches)

  /** q_band_power: the psd oracle's g CTE with per-band ascending-k
    * power sums. */
  private lazy val bandPowerOracleSql: String = {
    val n = 8
    def cs(j: Int, k: Int): Double = math.cos(-2.0 * math.Pi * j * k / n)
    def sn(j: Int, k: Int): Double = math.sin(-2.0 * math.Pi * j * k / n)
    def trigSum(k: Int, f: (Int, Int) => Double): String = {
      val cases = (0 until n)
        .map(j => s"WHEN $j THEN CAST(${f(j, k)} AS DOUBLE)")
        .mkString(" ")
      s"SUM(value * (CASE j $cases END))"
    }
    val aggs = (0 to n / 2).flatMap { k =>
      Seq(s"${trigSum(k, cs)} AS re$k", s"${trigSum(k, sn)} AS im$k")
    }.mkString(",\n        ")
    val bands = Seq(("low", 0, 1), ("mid", 2, 2), ("high", 3, 4))
    val branches = bands.map { case (name, lo, hi) =>
      // ascending-k left-to-right sum, the engine's aggregate fold order
      val terms = (lo to hi).map(k => s"re$k * re$k + im$k * im$k").mkString(" + ")
      s"SELECT user_id, win, '$name' AS band, round(log10($terms + 1), 4) AS log_power FROM f"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
r AS (SELECT user_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - 1 AS rn
      FROM e),
w AS (SELECT user_id, rn // $n AS win, CAST(rn % $n AS INT) AS j, value FROM r),
g AS (SELECT user_id, win, COUNT(*) AS nn,
        $aggs
      FROM w GROUP BY user_id, win),
f AS (SELECT * FROM g WHERE nn = $n)
$branches"""
  }

  /** q_coherence: the Welch chain replayed with UNROLLED direct-DFT
    * trig sums per channel (literal constants from the same driver
    * arithmetic as the engine's reference DFT), 4dp-quantized to
    * DECIMAL before the cross products — so the Welch sums compare
    * exactly and only the per-window bins carry the (sub-rounding)
    * butterflies-vs-direct float gap. */
  private lazy val coherenceOracleSql: String = {
    val n = 8
    def cs(j: Int, k: Int): Double = math.cos(-2.0 * math.Pi * j * k / n)
    def sn(j: Int, k: Int): Double = math.sin(-2.0 * math.Pi * j * k / n)
    def trig(k: Int, ch: Int, f: (Int, Int) => Double): String = {
      val cases = (0 until n).map(j => s"WHEN $j THEN CAST(${f(j, k)} AS DOUBLE)").mkString(" ")
      s"CAST(round(SUM(CASE WHEN ch = $ch THEN v * (CASE j $cases END) END), 4) AS DECIMAL(18,4))"
    }
    val aggs = (0 to n / 2).flatMap { k =>
      Seq(
        s"${trig(k, 0, cs)} AS xr$k", s"${trig(k, 0, sn)} AS xi$k",
        s"${trig(k, 1, cs)} AS yr$k", s"${trig(k, 1, sn)} AS yi$k")
    }.mkString(",\n        ")
    val branches = (0 to n / 2).map { k =>
      s"SELECT user_id, win, $k AS bin, xr$k AS xr, xi$k AS xi, yr$k AS yr, yi$k AS yi FROM f"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value AS v FROM events),
r AS (SELECT user_id, v,
        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - 1 AS rn
      FROM e),
c AS (SELECT user_id, v, CAST(rn % 2 AS INT) AS ch,
        (rn // 2) // $n AS win, CAST((rn // 2) % $n AS INT) AS j FROM r),
g AS (SELECT user_id, win, COUNT(*) AS nn,
        $aggs
      FROM c GROUP BY user_id, win),
f AS (SELECT * FROM g WHERE nn = ${2 * n}),
u AS ($branches),
roll AS (SELECT user_id, bin, CAST(COUNT(*) AS BIGINT) AS n_windows,
        SUM(xr * yr + xi * yi) AS cre, SUM(xi * yr - xr * yi) AS cim,
        SUM(xr * xr + xi * xi) AS sxx, SUM(yr * yr + yi * yi) AS syy
      FROM u GROUP BY user_id, bin)
SELECT user_id, bin, n_windows,
  CASE WHEN sxx > 0 AND syy > 0 THEN
    round((CAST(cre AS DOUBLE) * CAST(cre AS DOUBLE) + CAST(cim AS DOUBLE) * CAST(cim AS DOUBLE))
          / (CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6) END AS coherence
FROM roll"""
  }

  /** Shared CTE chain for the two-sample test oracles: per-distinct-
    * 2dp-value group counts with cumulative and total windows, over
    * the view/purchase event values. */
  private val twoSampleCte: String =
    """WITH e AS (SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS v
      |        FROM events WHERE event_type IN ('view', 'purchase')),
      |r AS (SELECT v, CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |        CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |      FROM e GROUP BY v),
      |c AS (SELECT *, SUM(ca) OVER (ORDER BY v) AS cuma, SUM(cb) OVER (ORDER BY v) AS cumb,
      |        SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM r)""".stripMargin

  /** q_ks_test: exact integer D and the cross-multiplied α decision
    * (c² scaled to 10⁻¹² integers on both engines). */
  private lazy val ksTestOracleSql: String = {
    val c2 = -math.log(0.05 / 2.0) / 2.0
    val c2p12 = math.round(c2 * 1e12)
    s"""$twoSampleCte,
       |d AS (SELECT na, nb,
       |        MAX(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)) AS dd
       |      FROM c GROUP BY na, nb)
       |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |  round(CAST(dd AS DOUBLE) / CAST(na * nb AS DOUBLE), 6) AS d,
       |  round(sqrt(CAST($c2 AS DOUBLE))
       |        * sqrt(CAST(na + nb AS DOUBLE) / CAST(na * nb AS DOUBLE)), 6) AS d_crit,
       |  CAST(dd * dd * 1000000000000 >
       |       CAST(na + nb AS HUGEINT) * (CAST(na AS HUGEINT) * nb) * $c2p12 AS INT) AS reject
       |FROM d""".stripMargin
  }

  /** q_mannwhitney: half-unit tie-averaged ranks, tie-corrected z. */
  private lazy val mannWhitneyOracleSql: String =
    s"""$twoSampleCte,
       |c2 AS (SELECT *, ca + cb AS t,
       |        COALESCE(SUM(ca + cb) OVER (ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
       |      FROM c),
       |agg AS (SELECT na, nb,
       |        SUM(CAST(bef * 2 + t + 1 AS HUGEINT) * ca) AS r2a,
       |        SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
       |      FROM c2 GROUP BY na, nb),
       |f AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |        (CAST(r2a AS DOUBLE) - CAST(na * (na + 1) AS DOUBLE)) / 2.0 AS ua,
       |        CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0 AS mu,
       |        CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
       |          ((CAST(na + nb AS DOUBLE) + 1.0)
       |           - CAST(ties AS DOUBLE)
       |             / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0))) AS varu
       |      FROM agg)
       |SELECT n_a, n_b, ua + 0.0 AS u_a,
       |  CASE WHEN varu > 0 THEN round((ua - mu) / sqrt(varu), 6) END AS z,
       |  CAST(COALESCE(abs(CASE WHEN varu > 0
       |        THEN round((ua - mu) / sqrt(varu), 6) END) >= 1.96, FALSE) AS INT) AS significant
       |FROM f""".stripMargin

  /** q_xcorr: the single-window lead trick re-derived — per lag l the
    * partner sample sits at offset 2l+1 in the interleaved stream
    * (negative offsets spelled as `lag()`, DuckDB's lead is
    * non-negative), sums exact 4dp decimals, rank ties on lag. */
  private lazy val xcorrOracleSql: String = {
    val lags = -3 to 3
    def nm(l: Int) = if (l < 0) s"ym${-l}" else s"yp$l"
    val leadCols = lags.map { l =>
      val off = 2 * l + 1
      val e = if (off >= 0) s"lead(v, $off) OVER w" else s"lag(v, ${-off}) OVER w"
      s"$e AS ${nm(l)}"
    }.mkString(",\n        ")
    val branches = lags.map { l =>
      s"""SELECT user_id, $l AS "lag", CAST(SUM(v * ${nm(l)}) AS DOUBLE) AS r,
         |  CAST(COUNT(${nm(l)}) AS BIGINT) AS n_terms FROM x GROUP BY user_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       |        CAST(value AS DECIMAL(18,2)) AS v FROM events),
       |r0 AS (SELECT user_id, v,
       |        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
       |      FROM e),
       |l AS (SELECT user_id, rn, v,
       |        $leadCols
       |      FROM r0 WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
       |x AS (SELECT * FROM l WHERE rn % 2 = 1),
       |u AS ($branches)
       |SELECT user_id, "lag", r, n_terms,
       |  CAST(row_number() OVER (PARTITION BY user_id
       |    ORDER BY r DESC NULLS LAST, "lag" ASC) AS INT) AS rank
       |FROM u""".stripMargin
  }

  /** q_ripples: the hysteresis chain replayed — DECIMAL-exact μ/σ
    * (identical doubles on both engines), low-threshold islands by
    * gaps-and-islands, high-threshold qualification, < 3-sample gap
    * merge, ≥ 2-sample duration gate. */
  private lazy val ripplesOracleSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
      |st AS (SELECT user_id, value AS v, ts_us,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE) AS s1,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |             OVER (PARTITION BY user_id) AS DOUBLE) AS s2,
      |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS n
      |      FROM e),
      |th AS (SELECT *, s1 / n AS mu,
      |        sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)) AS sigma FROM st),
      |f AS (SELECT user_id, ts_us, rn, v, v > mu + 2.0 * sigma AS hi
      |      FROM th WHERE v > mu + 1.0 * sigma),
      |isl AS (SELECT user_id, ts_us, rn, v, hi,
      |        rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS g FROM f),
      |ib AS (SELECT user_id, g, MIN(rn) AS srn, MAX(rn) AS ern,
      |        MIN(ts_us) AS sts, MAX(ts_us) AS ets,
      |        MAX(CASE WHEN hi THEN 1 ELSE 0 END) AS has_hi,
      |        MAX(CAST(v AS DECIMAL(18,2))) AS peak
      |      FROM isl GROUP BY 1, 2),
      |q AS (SELECT * FROM ib WHERE has_hi = 1),
      |m AS (SELECT *, CASE WHEN lag(ern) OVER w IS NOT NULL
      |                      AND srn - lag(ern) OVER w - 1 < 3
      |                 THEN 0 ELSE 1 END AS newev
      |      FROM q WINDOW w AS (PARTITION BY user_id ORDER BY srn)),
      |mc AS (SELECT *, SUM(newev) OVER (PARTITION BY user_id ORDER BY srn) AS ev FROM m),
      |ev AS (SELECT user_id, ev, MIN(sts) AS start_us, MAX(ets) AS stop_us,
      |        CAST(MAX(ern) - MIN(srn) + 1 AS BIGINT) AS n_samples,
      |        CAST(MAX(peak) AS DOUBLE) AS peak, MIN(srn) AS esrn
      |      FROM mc GROUP BY 1, 2)
      |SELECT user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY esrn) AS INT) AS event_seq,
      |  start_us, stop_us, n_samples, peak
      |FROM ev WHERE n_samples >= 2""".stripMargin

  /** Shared CTE chain for the MinHash-LSH oracles (q_minhash_lsh,
    * q_source_overlap): shingles → (h1,h2) seeds → minhash per seed →
    * band keys. */
  private val minhashBandsCte: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
      |       FROM toks, unnest(generate_series(0, len(t) - 3)) AS u(i)),
      |seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
      |hs AS (SELECT doc_id,
      |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
      |         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 1000000007 AS h2
      |       FROM sh),
      |mh AS (SELECT doc_id, seed, MIN((h1 % 1000000007 + seed * h2) % 1000000007) AS minhash
      |       FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
      |bands AS (SELECT doc_id, seed // 4 AS band,
      |            string_agg(seed || ':' || minhash, ',' ORDER BY seed) AS band_key
      |          FROM mh GROUP BY doc_id, seed // 4)""".stripMargin

  /** Shared oracle for q_sq8_topk and q_ivf_sq8 (full probing ⇒ every
    * pair scored exactly once ⇒ identical results). */
  private val sq8OracleSql: String =
    """WITH qz AS (SELECT vec_id,
      |        greatest(CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0, 1e-30) AS scale,
      |        embedding
      |      FROM embeddings),
      |qv AS (SELECT vec_id,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS q
      |       FROM qz),
      |sqn AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS s FROM qv),
      |p AS (SELECT qq.vec_id AS query_id, c.vec_id, qq.q AS a, c.q AS b
      |      FROM sqn c, (SELECT * FROM sqn WHERE vec_id < 5) qq
      |      WHERE c.vec_id <> qq.vec_id AND c.s > 0 AND qq.s > 0),
      |u AS (SELECT query_id, vec_id, unnest(a) AS av, unnest(b) AS bv FROM p),
      |d AS (SELECT query_id, vec_id, SUM(av * bv) AS dp, SUM(av * av) AS sa, SUM(bv * bv) AS sb
      |      FROM u GROUP BY query_id, vec_id),
      |c2 AS (SELECT query_id, vec_id,
      |         round(CAST(dp AS DOUBLE) / (sqrt(CAST(sa AS DOUBLE)) * sqrt(CAST(sb AS DOUBLE))), 6) AS cos_q
      |       FROM d),
      |r AS (SELECT query_id, vec_id, cos_q,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rank
      |      FROM c2)
      |SELECT query_id, vec_id, cos_q, rank FROM r WHERE rank <= 10""".stripMargin

  // ---- `.rec` generated oracles ---------------------------------------

  /** Sample recordings decoded driver-side (through the same RecFormat
    * reader the scan uses, full-packet pass) to a (file_rank, pos, ts)
    * VALUES twin — 55 packets. */
  private lazy val recSampleTsValues: String =
    RecFixture
      .decodeRaw(recSamplePaths)
      .map { case (r, p, ts, _) => s"($r,$p,$ts)" }
      .mkString(",")

  /** Per-file bounds/count from the FULL twin: `arg_min/arg_max(ts, pos)`
    * reproduces the first/last-packet bounds semantics (S2 reads exactly
    * those two packets), count(*) checks the size-derived packet count. */
  private lazy val recBoundsCte: String =
    s"""WITH raw(file_rank, pos, ts) AS MATERIALIZED (VALUES $recSampleTsValues),
       |b AS (SELECT file_rank, arg_min(ts, pos) AS start_ts, arg_max(ts, pos) AS stop_ts,
       |             COUNT(*) AS n_packets
       |      FROM raw GROUP BY file_rank)""".stripMargin

  private lazy val recCatalogOracleSql: String =
    s"""$recBoundsCte
       |SELECT CAST(file_rank AS INT) AS file_rank, CAST(start_ts AS BIGINT) AS start_ts,
       |       CAST(stop_ts AS BIGINT) AS stop_ts, CAST(n_packets AS BIGINT) AS n_packets
       |FROM b""".stripMargin

  private lazy val recSessionOracleSql: String =
    s"""$recBoundsCte
       |SELECT CAST(MIN(start_ts) AS BIGINT) AS start_ts, CAST(MAX(stop_ts) AS BIGINT) AS stop_ts,
       |       CAST(MAX(stop_ts) - MIN(start_ts) AS BIGINT) AS duration_w_gaps,
       |       CAST(SUM(stop_ts - start_ts) AS BIGINT) AS duration_wo_gaps,
       |       CAST(SUM(n_packets) AS BIGINT) AS n_packets
       |FROM b""".stripMargin

  /** q_rec_extract oracle: the fixture's raw decoded packets (exploded
    * per spike channel) as a VALUES twin, then the sanitize chain
    * re-implemented in SQL — keep-first by (file_rank, pos), epoch break
    * at diff ≥ maxGap+2, linear interpolation with trunc-toward-zero
    * int16 semantics for runs of ≤ maxGap missing samples. */
  private lazy val recExtractOracleSql: String = {
    val vals = RecFixture
      .decodeRaw(RecFixture.ensure())
      .iterator
      .flatMap { case (r, p, ts, vs) =>
        vs.iterator.zipWithIndex.map { case (v, c) => s"($r,$p,$ts,$c,$v)" }
      }
      .mkString(",")
    val brk = RecFixture.maxGapSize + 2
    val maxD = RecFixture.maxGapSize + 1
    s"""WITH raw(file_rank, pos, ts, channel, value) AS MATERIALIZED (VALUES $vals),
       |keep AS MATERIALIZED (SELECT ts, channel, value FROM
       |        (SELECT ts, channel, value,
       |                row_number() OVER (PARTITION BY ts, channel ORDER BY file_rank, pos) AS rn
       |         FROM raw)
       |      WHERE rn = 1),
       |pk AS (SELECT DISTINCT ts FROM keep),
       |p0 AS (SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev, lead(ts) OVER (ORDER BY ts) AS nxt FROM pk),
       |sg AS MATERIALIZED (SELECT ts, nxt,
       |        SUM(CASE WHEN prev IS NOT NULL AND ts - prev >= $brk THEN 1 ELSE 0 END)
       |          OVER (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
       |      FROM p0),
       |gaps AS (SELECT seg, ts AS t0, nxt AS t1 FROM sg
       |         WHERE nxt IS NOT NULL AND nxt - ts > 1 AND nxt - ts <= $maxD),
       |it AS (SELECT seg, t0, t1, u.t AS t FROM gaps, unnest(generate_series(t0 + 1, t1 - 1)) AS u(t)),
       |interp AS (SELECT i.seg, i.t AS ts, k0.channel,
       |        CAST(TRUNC(k0.value + (i.t - i.t0) * (k1.value - k0.value) / CAST(i.t1 - i.t0 AS DOUBLE)) AS SMALLINT) AS value
       |      FROM it i JOIN keep k0 ON k0.ts = i.t0
       |                JOIN keep k1 ON k1.ts = i.t1 AND k1.channel = k0.channel)
       |SELECT CAST(s.seg AS BIGINT) AS segment_id, CAST(k.ts AS BIGINT) AS ts, 0 AS interpolated,
       |       CAST(k.channel AS INT) AS channel, CAST(k.value AS SMALLINT) AS value
       |FROM keep k JOIN sg s ON s.ts = k.ts
       |UNION ALL
       |SELECT CAST(seg AS BIGINT), CAST(ts AS BIGINT), 1, CAST(channel AS INT), value FROM interp""".stripMargin
  }

  /** F6 twin: the extract oracle's value column through the exact-0.125
    * scaling. */
  private lazy val recUvOracleSql: String =
    s"""SELECT ts, channel, round(CAST(value AS DOUBLE) * 0.125, 4) AS uv
       |FROM ($recExtractOracleSql)""".stripMargin

  /** Shared oracle for q_bm25 and q_bm25_serve (same terms/k ⇒ same
    * result; the serving index merely materializes tf/df/stats). */
  private val bm25OracleSql: String =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |stats AS (SELECT COUNT(*) AS n, AVG(len(t)) AS avgdl FROM docs),
      |toks AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS tok FROM docs),
      |tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      |       WHERE tok IN ('scan', 'join', 'vector', 'stream', 'merge', 'zzz')
      |       GROUP BY doc_id, dl, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tf) GROUP BY tok),
      |sc AS (SELECT doc_id, COUNT(*) AS n_terms,
      |         round(SUM(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2
      |                   / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS score
      |       FROM tf JOIN df USING (tok) CROSS JOIN stats GROUP BY doc_id)
      |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, score
      |FROM sc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin
}
