package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the engine's stateful operators
  * (SURVEY.md §2.10): the reference is a bounded pull-based generator
  * pipeline; the same semantics map onto Structured Streaming with
  *  - `session_window` for gap-based epoching (W1),
  *  - `flatMapGroupsWithState` for the loop-carried censor (W3) and the
  *    across-batch interpolation state (W6).
  * Batch stays the primary engine; these wrappers prove the operators
  * carry over unchanged.
  */
object Streaming {

  /** W1 as a streaming query: gap-based sessions per key using Spark's
    * native session_window (gapDuration in a time unit; the batch
    * engine's `gap = 2·step` becomes `gapDuration = 2·step/fs` seconds,
    * SURVEY.md §2.10). `tsCol` must be a TimestampType column. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String, gapDuration: String): DataFrame =
    events
      .withWatermark(tsCol, gapDuration)
      .groupBy(col(keyCol), session_window(col(tsCol), gapDuration))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")
      )

  /** Per-source ingestion telemetry over TUMBLING event-time windows
    * with a watermark — the admission-control dashboard for a streaming
    * curation pipeline (docs/s and tokens/s per source and window).
    * Complements [[sessionCounts]] (gap windows) with the fixed-window
    * + watermark + late-data-drop shape: in Append mode a window emits
    * exactly once, after the watermark passes its end, and rows later
    * than the watermark are dropped rather than mutating an emitted
    * window (the exactly-once contract a downstream ledger needs).
    * State is bounded by (sources × open windows) — watermark expiry
    * evicts closed windows, so a year-long stream holds only the
    * in-flight tail. */
  def tokenRateStream(
      docs: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String
  ): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens")
      )
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"),
        col("n_docs"),
        col("n_tokens")
      )

  /** Streaming twin of [[graft.ops.Changelog]]'s sibling rollup
    * [[graft.ops.Resample.ohlc]]: per (key, tumbling event-time
    * window) open/high/low/close over a live metric stream. The
    * argmin/argmax ride `min_by`/`max_by` exactly like batch — both
    * are partial-MERGE-safe, so micro-batch partials combine into the
    * identical answer regardless of arrival slicing (StreamingSpec
    * pins batch parity). Append mode + watermark: a window emits once,
    * after the watermark passes; state is O(keys × open windows). */
  def ohlcStream(
      events: DataFrame,
      eventTimeCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String
  ): DataFrame = {
    val v = col("value").cast("decimal(18,2)")
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration), col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        min_by(v, col(eventTimeCol)).as("open"),
        max_by(v, col(eventTimeCol)).as("close"),
        max(v).as("high"),
        min(v).as("low"),
        sum(v).as("vsum"))
      .select(
        col("window.start").as("win_start"),
        col(keyCol),
        col("n"), col("open"), col("close"), col("high"), col("low"), col("vsum"))
  }

  /** Live touch attribution as a watermarked STREAM-STREAM join — the
    * one Structured Streaming join mechanism the keyed-state twins
    * don't cover: both sides are unbounded, and Spark buffers each
    * side's rows in watermark-bounded state, emitting a match the
    * moment both halves have arrived. Each conversion pairs with
    * EVERY touch of the same key inside `[conv − lookback, conv]`
    * (the multi-touch feed; the batch [[graft.ops.AsOf]]-based
    * last-touch view is one `max_by` rollup downstream of this).
    * State is bounded by the watermark: a touch can be dropped once
    * it is `lookback + delay` older than the slowest stream's clock —
    * exactly the event-time range condition Spark derives the state
    * eviction from.
    *
    * Inner semantics: unconverted touches and touch-less conversions
    * emit nothing (the batch left-join view re-adds the latter).
    * `touchTime`/`convTime` must be TimestampType event times.
    */
  def touchAttributionStream(
      touches: DataFrame,     // (key, touch_id, touchTime)
      conversions: DataFrame, // (key, conv_id, convTime)
      lookback: String,
      delay: String
  ): DataFrame = {
    val t = touches.withWatermark("touch_time", delay)
    val c = conversions.withWatermark("conv_time", delay)
    t.join(
      c,
      t("key") === c("key") &&
        t("touch_time") <= c("conv_time") &&
        t("touch_time") >= c("conv_time") - expr(s"INTERVAL $lookback"),
      "inner")
      .select(
        c("key"), c("conv_id"), c("conv_time"),
        t("touch_id"), t("touch_time"))
  }

  /** Event for the streaming censor: a detection at sample `idx` on `key`. */
  final case class Detection(key: String, idx: Long)
  final case class Kept(key: String, idx: Long)

  /** Integral-ts sample for the streaming gap filler. */
  final case class Sample(key: String, ts: Long, value: Double)
  final case class Filled(key: String, ts: Long, value: Double, interpolated: Boolean)

  /** W6 as streaming state: the reference carries `(prev_ts,
    * prev_channel_data)` across generator blocks so a gap straddling a
    * block boundary still interpolates (jagular/utils.py:443-477). Here
    * the same state lives in `flatMapGroupsWithState`: per key, the last
    * seen sample; each arriving sample emits any missing integral ts
    * between the carried sample and itself (gap ≤ maxGapSize) with
    * 2-point linear interpolation, then itself. Requires per-key in-order
    * delivery, as in the reference's generator chain. */
  def gapFillStream(
      samples: Dataset[Sample],
      step: Long,
      maxGapSize: Long
  ): Dataset[Filled] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Double), Filled](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          // per-batch groups can be large under a big trigger budget:
          // sort an array in place (no boxed Seq copy), update the state
          // EAGERLY from the sorted tail (state writes must happen before
          // this function returns), and emit a fully LAZY iterator — the
          // fill stream is never materialized per group
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: Sample, b: Sample) => a.ts < b.ts)
          var carried: Option[(Long, Double)] = state.getOption
          state.update((arr.last.ts, arr.last.value))
          arr.iterator.flatMap { s =>
            val fills = carried match {
              case Some((pt, pv))
                  if s.ts - pt > step && s.ts - pt <= maxGapSize * step + step =>
                (pt + step until s.ts by step).iterator.map { t =>
                  val v = pv + (t - pt).toDouble * (s.value - pv) / (s.ts - pt).toDouble
                  Filled(key, t, v, interpolated = true)
                }
              case _ => Iterator.empty
            }
            carried = Some((s.ts, s.value))
            fills ++ Iterator.single(Filled(key, s.ts, s.value, interpolated = false))
          }
      }
  }

  /** Trending tokens at ingest: watermarked TUMBLING-window top-k token
    * heavy hitters via the Space-Saving sketch
    * ([[graft.functions.SpaceSavingTopK]] — a TypedImperativeAggregate,
    * so the state store carries one bounded `capacity`-entry summary
    * per window instead of the full token histogram; the same sketch
    * the batch [[graft.ops.Text.topNgramsSketch]] path uses, with the
    * same deduction-certificate `err` column). Emits once per CLOSED
    * window (append mode): (win_start, token, n_est, err), top-k by
    * (est desc, token asc). The spike/drift monitor a curation
    * pipeline runs next to the admission-control stream. */
  def trendingTokensStream(
      docs: DataFrame,
      tsCol: String,
      windowDur: String,
      watermark: String,
      k: Int,
      capacity: Int
  ): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(split(col("text"), " ")).as("tok"))
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.functions.SpaceSavingTopK.topkSketch(col("tok"), capacity).as("__top"))
      .select(
        col("window.start").as("win_start"),
        explode(expr(
          s"""slice(array_sort(__top, (a, b) ->
             |  CASE WHEN a.est > b.est THEN -1 WHEN a.est < b.est THEN 1
             |       WHEN a.item < b.item THEN -1 WHEN a.item > b.item THEN 1
             |       ELSE 0 END), 1, $k)""".stripMargin)).as("e"))
      .select(
        col("win_start"),
        col("e.item").as("token"),
        col("e.est").as("n_est"),
        col("e.err").as("err"))

  /** Streaming distinct-cardinality monitor: per event-time window,
    * the KMV estimate of distinct `itemCol` values
    * ([[graft.functions.KMinValues]] — the k smallest distinct 60-bit
    * hashes). O(k) state per OPEN window regardless of ingest volume,
    * watermark-evicted — the diversity-drift telemetry a live pipeline
    * watches (a collapsing distinct rate is the classic
    * upstream-dedup-broke / stuck-producer signal). Identical
    * hash + estimator chain as the batch
    * [[graft.ops.Cardinality.kmvDistinct]]; StreamingSpec pins parity
    * against the batch rollup on a replayed stream. */
  def distinctRateStream(
      rows: DataFrame,
      tsCol: String,
      itemCol: String,
      windowDur: String,
      watermark: String,
      k: Int,
      // md5Hash = true: the batch-parity / SQL-reproducible hash
      // (md5-front-60-bit, [[graft.ops.Cardinality.itemHash]]).
      // false: codegen'd xxhash64 folded to the same 60-bit domain —
      // ~2× ingest rate (DistinctRateBench), same estimator and error
      // bound, just not respellable in an external SQL engine. A live
      // monitor wants the rate; pick md5 only when cross-checking
      // against the batch rollup.
      md5Hash: Boolean = true,
      // SLIDING windows: emit one estimate per `slideDur` hop, each
      // covering the trailing `windowDur` (the smoother monitor shape —
      // a spike is seen windowDur/slideDur times instead of once). A
      // row lands in windowDur/slideDur open windows, so state scales
      // by that factor; None = tumbling (the default).
      slideDur: Option[String] = None
  ): DataFrame = {
    val (fill, est) = graft.ops.Cardinality.estimate(col("__kmv"), k)
    val h =
      if (md5Hash) graft.ops.Cardinality.itemHash(col(itemCol))
      else shiftrightunsigned(xxhash64(col(itemCol)), 4)
    val win = slideDur match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    rows
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), h.as("__h"))
      .groupBy(win)
      .agg(graft.functions.KMinValues.kMinValues(col("__h"), k).as("__kmv"))
      .select(col("window.start").as("win_start"), fill, est)
  }

  /** Streaming twin of [[graft.ops.Profile.profile]] — the live
    * per-ingest-batch data-quality monitor: one windowed aggregate
    * computes the FULL per-column battery (completeness, KMV distinct,
    * range, exact-decimal mean) for every profiled column, emitting
    * one report row per (window, column) on window close. The
    * aggregate battery is [[graft.ops.Profile.aggExprs]] VERBATIM
    * (all algebraic + the mergeable KMV sketch, so partial-merge
    * across micro-batches is exact), which is what makes the streamed
    * report row-identical to the batch profile of the same window's
    * rows — StreamingSpec pins the parity. State per window is
    * O(columns · k). */
  def profileStream(
      rows: DataFrame,
      tsCol: String,
      windowDur: String,
      watermark: String,
      numericCols: Seq[String],
      stringCols: Seq[String] = Nil,
      k: Int = 64
  ): DataFrame = {
    val cols = graft.ops.Profile.checkCols(numericCols, stringCols, k)
    graft.ops.Profile.hashCols(rows.withWatermark(tsCol, watermark), cols)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("__n"), graft.ops.Profile.aggExprs(cols, k): _*)
      .select(
        col("window.start").as("win_start"),
        explode(graft.ops.Profile.rowStructs(cols, k)).as("__p"))
      .select(col("win_start"), col("__p.*"))
  }

  /** Streaming twin of [[graft.ops.Calibration.reliabilityBins]] —
    * the live calibration monitor: per (window, score bin), count /
    * positives / exact 4dp score mass, emitted on window close. The
    * battery is [[graft.ops.Calibration.binAggs]] VERBATIM (all
    * algebraic, partial-merge-exact across micro-batches), bin edges
    * the same 4dp-DECIMAL [[graft.ops.Calibration.binOf]], the same
    * in-plan out-of-range guard — so the streamed rows for a window
    * are row-identical to the batch rollup of that window's rows
    * (StreamingSpec pins the parity). State is O(nBins × open
    * windows). */
  def reliabilityStream(
      rows: DataFrame,
      tsCol: String,
      scoreCol: String,
      labelCol: String,
      windowDur: String,
      watermark: String,
      nBins: Int
  ): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    graft.ops.Calibration.guardScores(rows, scoreCol)
      .withWatermark(tsCol, watermark)
      .withColumn("bin", graft.ops.Calibration.binOf(col(scoreCol), nBins))
      .groupBy(window(col(tsCol), windowDur), col("bin"))
      .agg(
        graft.ops.Calibration.binAggs(scoreCol, labelCol).head,
        graft.ops.Calibration.binAggs(scoreCol, labelCol).tail: _*)
      .select(col("window.start").as("win_start"), col("bin"),
        col("n"), col("n_pos"), col("score_sum"))
  }

  /** Streaming twin of [[graft.ops.Calibration.ece]]: one `(win_start,
    * n, ece)` row per closed window. Append mode allows ONE stateful
    * aggregation, so the per-bin partials ride as `nBins` static
    * column pairs inside the single window rollup (the quantilesStream
    * vector recipe — nBins is small and fixed); the telescoped
    * `Σ_b |n_pos_b − score_sum_b| / n` then folds STATELESSLY on the
    * closed window's row, through the same DECIMAL-exact
    * [[graft.ops.Calibration.eceFromTotals]] single 6dp rounding as
    * batch. */
  def eceStream(
      rows: DataFrame,
      tsCol: String,
      scoreCol: String,
      labelCol: String,
      windowDur: String,
      watermark: String,
      nBins: Int
  ): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val s = col(scoreCol).cast("decimal(9,4)")
    val bin = graft.ops.Calibration.binOf(col(scoreCol), nBins)
    val perBin = (0 until nBins).flatMap { i =>
      Seq(
        sum(when(bin === i, when(col(labelCol).cast("int") === 1, 1L).otherwise(0L))
          .otherwise(0L)).as(s"__np_$i"),
        sum(when(bin === i, s).otherwise(lit(0).cast("decimal(9,4)"))).as(s"__ss_$i"))
    }
    val totalDiff = (0 until nBins)
      .map(i => abs(col(s"__np_$i").cast("decimal(38,4)") - col(s"__ss_$i")))
      .reduce(_ + _)
    graft.ops.Calibration.guardScores(rows, scoreCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"), perBin: _*)
      .select(
        col("window.start").as("win_start"),
        col("n"),
        graft.ops.Calibration.eceFromTotals(totalDiff, col("n")).as("ece"))
  }

  /** Streaming twin of [[graft.ops.Experiment.abTest]] — the live
    * experiment monitor: per closed window, every arm's exposure /
    * conversion counts, 6dp rate, pooled two-proportion z vs control
    * and the 1.96 flag. Append mode allows ONE stateful aggregation,
    * so the per-arm partials ride as static column pairs inside the
    * single window rollup (the eceStream recipe — `variants` must be
    * declared up front; rows with an undeclared variant fail LOUD
    * in-plan rather than silently skew every arm's denominator).
    * The z chain is the batch operator's IEEE operation order
    * verbatim, applied statelessly on the closed window's row;
    * StreamingSpec pins row-identity with batch abTest per window.
    * State is O(|variants|) per open window. */
  def abTestStream(
      rows: DataFrame,
      tsCol: String,
      variantCol: String,
      convCol: String,
      variants: Seq[String],
      controlVariant: String,
      windowDur: String,
      watermark: String
  ): DataFrame = {
    require(variants.nonEmpty && variants.contains(controlVariant),
      s"variants must include the control '$controlVariant', got $variants")
    require(variants.distinct == variants, s"duplicate variants in $variants")
    val known = rows.where(
      when(!col(variantCol).isin(variants: _*),
        raise_error(concat(lit("abTestStream: undeclared variant "), col(variantCol))))
        .otherwise(lit(true)))
    def safe(i: Int) = s"__v$i"
    val perArm = variants.zipWithIndex.flatMap { case (v, i) =>
      Seq(
        sum(when(col(variantCol) === v, 1L).otherwise(0L)).as(s"${safe(i)}_n"),
        sum(when(col(variantCol) === v && col(convCol).cast("int") === 1, 1L)
          .otherwise(0L)).as(s"${safe(i)}_conv"))
    }
    val ci = variants.indexOf(controlVariant)
    val agg = known
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(perArm.head, perArm.tail: _*)
    val nC = col(s"${safe(ci)}_n")
    val convC = col(s"${safe(ci)}_conv")
    val armStructs = array(variants.zipWithIndex.map { case (v, i) =>
      val n = col(s"${safe(i)}_n")
      val conv = col(s"${safe(i)}_conv")
      val p1 = conv.cast("double") / n.cast("double")
      val p2 = convC.cast("double") / nC.cast("double")
      val pPool = (conv + convC).cast("double") / (n + nC).cast("double")
      val se = sqrt(pPool * (lit(1.0) - pPool) *
        (lit(1.0) / n.cast("double") + lit(1.0) / nC.cast("double")))
      val z = when(lit(v) =!= controlVariant && n > 0 && nC > 0 && se > 0,
        round((p1 - p2) / se, 6))
      struct(
        lit(v).as("variant"), n.as("n"), conv.as("conv"),
        when(n > 0, round(p1, 6)).as("rate"), z.as("z"),
        coalesce((abs(z) >= 1.96).cast("int"), lit(0)).as("significant"))
    }: _*)
    agg
      .select(col("window.start").as("win_start"), explode(armStructs).as("__a"))
      .select(col("win_start"), col("__a.*"))
  }

  /** Streaming twin of [[graft.ops.Profile.histQuantiles]]: windowed
    * quantile estimates over a live metric stream — the percentile
    * lane of the [[profileStream]] monitor. Same estimator: fixed
    * equi-width buckets, estimate = the lower edge of the first
    * bucket reaching ⌈p·n⌉; bucket counts are plain algebraic
    * aggregates, so micro-batch partials merge exactly and state is
    * O(buckets × open windows). One difference is forced by
    * streaming: the bucket BOUNDS cannot come from a first pass over
    * the unbounded stream, so the caller pins (`lo`, `hi`) — from a
    * profile snapshot or SLA spec; values outside clamp into the edge
    * buckets (tracked in the estimate exactly as batch clamps its
    * max into the top bucket). With bounds equal to the batch data's
    * min/max the two estimators agree bit-for-bit (StreamingSpec
    * pins it). Emits one row per (window, prob) on window close. */
  def quantilesStream(
      rows: DataFrame,
      tsCol: String,
      valCol: String,
      windowDur: String,
      watermark: String,
      probs: Seq[Double],
      lo: Double,
      hi: Double,
      buckets: Int = 1024
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1), s"bad probs $probs")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val width = (hi - lo) / buckets
    val b = least(
      greatest(floor((col(valCol).cast("double") - lit(lo)) / lit(width)), lit(0))
        .cast("int"),
      lit(buckets - 1))
    // ONE stateful aggregation (append mode allows exactly one): the
    // per-window bucket-count VECTOR as `buckets` algebraic sums —
    // partial-merge-exact, O(buckets) state per open window
    val vec = array(Seq.tabulate(buckets)(i =>
      sum(when(b === i, 1L).otherwise(0L))): _*)
    val probsArr = array(probs.map(lit(_)): _*)
    val agg = rows
      .where(col(valCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"), vec.as("__bs"))
    // post-aggregation (stateless): per prob, the first bucket whose
    // running cumulative reaches ⌈p·n⌉ — a fold over the fixed-length
    // vector, evaluated only on the closed window's single row. The
    // running-sum array is plain bigints (struct field aliases do not
    // survive inside HOF lambdas); the 1-based position of the first
    // qualifying cumulative IS the bucket index + 1.
    val cums = aggregate(
      col("__bs"),
      array().cast("array<bigint>"),
      (acc, x) => concat(acc, array(coalesce(try_element_at(acc, lit(-1)), lit(0L)) + x)))
    agg
      .select(
        col("window.start").as("win_start"),
        col("n"),
        explode(probsArr).as("prob"),
        cums.as("__cums"))
      .withColumn(
        "__idx",
        array_position(
          transform(col("__cums"), c => c >= ceil(col("prob") * col("n"))), true))
      .withColumn("q_est", lit(lo) + (col("__idx") - 1).cast("double") * lit(width))
      .select("win_start", "n", "prob", "q_est")
  }

  /** Live distribution-drift monitor — the streaming form of
    * [[graft.ops.Stats.ksTest]] against a FIXED baseline histogram
    * (the batch-profiled reference distribution, the deployment form:
    * a drift monitor compares live traffic to a pinned baseline, not
    * two live streams). Values bucket into `buckets` equi-width bins
    * on [lo, hi] (the [[quantilesStream]] recipe — ONE windowed
    * aggregation building the per-window count vector, stateless
    * post-processing on the closed window's single row), and the
    * bucketed KS statistic
    *
    *   D = max_i |cumObs_i / n − cumRef_i / nRef|
    *
    * is computed as the exact integer max |cumObs·nRef − cumRef·n|,
    * with the α decision as the same DECIMAL cross-multiply as batch
    * (c² pinned at 10⁻¹² scale) — no float sits on the alarm boundary.
    *
    * Output per closed window: (win_start, n, d 6dp, reject 0/1). */
  def ksDriftStream(
      rows: DataFrame,
      tsCol: String,
      valCol: String,
      windowDur: String,
      watermark: String,
      lo: Double,
      hi: Double,
      baseline: Seq[Long],
      alpha: Double = 0.05
  ): DataFrame = {
    require(baseline.nonEmpty && baseline.forall(_ >= 0) && baseline.sum > 0,
      "baseline must be a non-empty, non-negative histogram with mass")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val buckets = baseline.length
    val width = (hi - lo) / buckets
    val b = least(
      greatest(floor((col(valCol).cast("double") - lit(lo)) / lit(width)), lit(0))
        .cast("int"),
      lit(buckets - 1))
    val vec = array(Seq.tabulate(buckets)(i =>
      sum(when(b === i, 1L).otherwise(0L))): _*)
    val agg = rows
      .where(col(valCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"), vec.as("__bs"))
    val refCums = baseline.scanLeft(0L)(_ + _).tail
    val nRef = baseline.sum
    val refArr = array(refCums.map(lit(_)): _*)
    val cums = aggregate(
      col("__bs"),
      array().cast("array<bigint>"),
      (acc, x) => concat(acc, array(coalesce(try_element_at(acc, lit(-1)), lit(0L)) + x)))
    val c2p12 = math.round(-math.log(alpha / 2.0) / 2.0 * 1e12)
    agg
      .select(col("window.start").as("win_start"), col("n"), cums.as("__cums"))
      .withColumn("__dint",
        array_max(zip_with(col("__cums"), refArr,
          (o, r) => abs(o * lit(nRef) - r * col("n")))))
      .select(
        col("win_start"), col("n"),
        round(col("__dint").cast("double") /
          (col("n").cast("decimal(38,0)") * nRef).cast("double"), 6).as("d"),
        (col("__dint").cast("decimal(38,0)") * col("__dint") * lit(1000000000000L) >
          (col("n") + lit(nRef)).cast("decimal(38,0)") *
            (col("n").cast("decimal(38,0)") * nRef) * c2p12)
          .cast("int").as("reject"))
  }

  /** Live PSI drift monitor — the streaming deployment form of
    * [[graft.ops.Stats.psi]] against a FIXED baseline histogram (the
    * [[ksDriftStream]] recipe: one windowed aggregation builds the
    * per-window bucket vector; the statistic evaluates statelessly on
    * the closed window's single row). Values bucket into equi-width
    * bins on [lo, hi]; per bin the PSI term (pa − pb)·ln(pa/pb) uses
    * the batch operator's exact determinism chain — 10⁻⁶ clamping,
    * per-term 12dp round into DECIMAL(38,12), FIXED bin-order sum —
    * and the alert compares the exact decimal sum against the 0.2
    * literal, so micro-batch slicing cannot move the alarm.
    * Baseline shares are driver-side literals (pinned at monitor
    * deploy time, like the ksDriftStream histogram).
    *
    * Output per closed window: (win_start, n, psi 6dp, alert 0/1). */
  def psiDriftStream(
      rows: DataFrame,
      tsCol: String,
      valCol: String,
      windowDur: String,
      watermark: String,
      lo: Double,
      hi: Double,
      baseline: Seq[Long]
  ): DataFrame = {
    require(baseline.nonEmpty && baseline.forall(_ >= 0) && baseline.sum > 0,
      "baseline must be a non-empty, non-negative histogram with mass")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val buckets = baseline.length
    val width = (hi - lo) / buckets
    val nRef = baseline.sum
    val pbC = baseline.map(c => math.max(c.toDouble / nRef, 1e-6))
    val b = least(
      greatest(floor((col(valCol).cast("double") - lit(lo)) / lit(width)), lit(0))
        .cast("int"),
      lit(buckets - 1))
    val vec = array(Seq.tabulate(buckets)(i =>
      sum(when(b === i, 1L).otherwise(0L))): _*)
    val agg = rows
      .where(col(valCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"), vec.as("__bs"))
    val termSum = Seq.tabulate(buckets) { i =>
      val paC = greatest(
        element_at(col("__bs"), i + 1).cast("double") / col("n").cast("double"),
        lit(1e-6))
      round((paC - lit(pbC(i))) * log(paC / lit(pbC(i))), 12)
        .cast("decimal(38,12)")
    }.reduce(_ + _)
    agg
      .select(col("window.start").as("win_start"), col("n"), termSum.as("__psid"))
      .select(
        col("win_start"), col("n"),
        round(col("__psid").cast("double"), 6).as("psi"),
        (col("__psid") > lit(new java.math.BigDecimal("0.200000000000")))
          .cast("int").as("alert"))
  }

  /** Live seasonal-profile scoring — a STREAM-STATIC join (the one
    * Structured Streaming join family the other twins don't
    * exercise): the per-(key, phase) profile is trained in batch
    * ([[graft.ts.Seasonal.profile]], the deployment artifact) and the
    * live stream joins it statelessly — no watermark, no keyed state,
    * every micro-batch row scored independently with the SAME exact
    * integer chain as batch [[graft.ts.Seasonal.score]] (micro-exact
    * residual, integer-compare alarm), so stream/batch parity is
    * bit-for-bit by construction. Rows whose (key, phase) is not in
    * the profile drop, exactly as in batch.
    *
    * The static side is a bounded keys × phases frame — Spark
    * broadcasts it to every micro-batch; the stream never shuffles. */
  def seasonalScoreStream(
      stream: DataFrame,
      prof: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      binUs: Long,
      phases: Int,
      thresholdMicro: Long
  ): DataFrame =
    graft.ts.Seasonal.score(
      stream, broadcast(prof), keyCols, tsCol, valCol, binUs, phases, thresholdMicro)

  /** Live isotonic-calibration serving — the deployment form of the
    * [[graft.ops.Calibration.isotonicFit]] lane (fit in batch, the
    * trained-artifact recipe; serve on the stream): each micro-batch
    * row's 4dp score looks up its pooled calibrated value through the
    * SAME broadcast equi-join as batch
    * [[graft.ops.Calibration.isotonicScore]] — stateless, no
    * watermark, the static fitted table (bounded by the 4dp score
    * vocabulary) broadcast to every micro-batch; the stream never
    * shuffles. Stream/batch parity is bit-for-bit by construction
    * (identical function), rows with fit-unseen score buckets drop
    * exactly as in batch, out-of-[0,1] scores fail loud. */
  def isotonicScoreStream(
      stream: DataFrame,
      scoreCol: String,
      fit: Seq[graft.ops.Calibration.IsoStep]
  ): DataFrame =
    graft.ops.Calibration.isotonicScore(stream, scoreCol, fit)

  /** One conversion observation for [[sprtStream]]. */
  final case class ArmConv(variant: String, conv: Int)

  /** Running SPRT state after a micro-batch folded into an arm. */
  final case class SprtUpdate(
      variant: String, n: Long, conv: Long, llr: Double, decision: String)

  /** Streaming twin of [[graft.ops.Experiment.sprt]] — the live
    * always-valid experiment monitor, which is the POINT of a
    * sequential test (decide the moment the boundary is crossed, not
    * at a fixed horizon). State per arm is the exact (n, conv) pair;
    * each micro-batch folds its rows in and emits one [[SprtUpdate]]
    * with the SAME integer llr/decision chain as batch (the pinned
    * 10⁻⁶ log literals), so the final emission per arm equals the
    * batch operator on the same rows — micro-batch slicing only adds
    * intermediate trajectory points, it cannot move a decision. */
  def sprtStream(
      rows: Dataset[ArmConv],
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.2
  ): Dataset[SprtUpdate] = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct rates in (0,1), got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta must be in (0,1), got $alpha/$beta")
    import rows.sparkSession.implicits._
    val l1 = math.round(math.log(p1 / p0) * 1e6)
    val l0 = math.round(math.log((1 - p1) / (1 - p0)) * 1e6)
    val upper = math.round(math.log((1 - beta) / alpha) * 1e6)
    val lower = math.round(math.log(beta / (1 - alpha)) * 1e6)
    rows
      .groupByKey(_.variant)
      .flatMapGroupsWithState[(Long, Long), SprtUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (variant, it, state: GroupState[(Long, Long)]) =>
          var (n, conv) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r => n += 1; conv += (if (r.conv != 0) 1L else 0L) }
          state.update((n, conv))
          val llr = conv * l1 + (n - conv) * l0
          val decision =
            if (llr >= upper) "accept_h1"
            else if (llr <= lower) "accept_h0"
            else "continue"
          Iterator.single(SprtUpdate(variant, n, conv, llr / 1e6, decision))
      }
  }

  /** Input row for [[asofEnrichStream]]: `side` 0 = state update (the
    * dimension stream), 1 = probe event (the fact stream). */
  final case class AsOfInput(key: String, ts: Long, side: Int, value: Double)
  final case class AsOfEnriched(key: String, ts: Long, value: Option[Double])

  /** Streaming twin of [[graft.ops.AsOf.asofBackward]]: a live event
    * stream enriched with the LATEST prior dimension value per key (the
    * point-in-time feature lookup, at ingest). Both streams arrive as
    * one tagged union; per key the state carries only the latest
    * update — O(keys) state, no buffering of either stream. Within a
    * micro-batch rows sort by (ts, side) so an update at exactly the
    * probe's ts is visible (the inclusive `<=` bound of the batch
    * operator); across micro-batches the carried state provides it.
    * Probes before any update emit None. Requires per-key in-order
    * delivery across batches (the [[gapFillStream]] precondition). */
  def asofEnrichStream(rows: Dataset[AsOfInput]): Dataset[AsOfEnriched] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Double), AsOfEnriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[(Long, Double)]) =>
          val arr = it.toArray
          scala.util.Sorting.stableSort(
            arr,
            (a: AsOfInput, b: AsOfInput) => a.ts < b.ts || (a.ts == b.ts && a.side < b.side))
          var carried: Option[(Long, Double)] = state.getOption
          val out = arr.iterator.flatMap { r =>
            if (r.side == 0) {
              carried = Some((r.ts, r.value))
              Iterator.empty
            } else
              Iterator.single(AsOfEnriched(key, r.ts, carried.map(_._2)))
          }.toVector // materialize BEFORE the state write below
          carried.foreach(state.update)
          out.iterator
      }
  }

  /** W2 consecutive-crossing detection as streaming state: per key,
    * carry the previous sample's (idx, aboveThreshold) across
    * micro-batches; emit idx when sample idx and idx+1 are BOTH above
    * threshold (the ≥2-consecutive rule, jagular/spikes.py:368-373 —
    * emission happens when the SECOND sample arrives). Requires per-key
    * in-order delivery, as in the reference's generator chain. */
  def crossingsStream(
      samples: Dataset[Sample],
      threshold: Double
  ): Dataset[Kept] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Boolean), Kept](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Boolean)]) =>
          var prev: Option[(Long, Boolean)] = state.getOption
          val out = rows.toSeq.sortBy(_.ts).flatMap { s =>
            val above = s.value > threshold
            val hit = prev match {
              case Some((pt, pAbove)) if pAbove && above && s.ts == pt + 1 => Some(Kept(key, pt))
              case _ => None
            }
            prev = Some((s.ts, above))
            hit
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** U2 dedup-keep-first as a streaming query: duplicate (key, ts)
    * arrivals within the watermark keep only the FIRST occurrence.
    * Spark's `dropDuplicatesWithinWatermark` holds per-(key, ts) state
    * exactly until the watermark passes — bounded state, unlike a naive
    * keyed-state set (the reference's in-core dedup, jagular/
    * utils.py:330-338, never expires because it sees data in one pass;
    * the watermark IS that single-pass guarantee in streaming form).
    * `eventTimeCol` must be TimestampType. */
  def dedupKeepFirstStream(
      samples: DataFrame,
      eventTimeCol: String,
      keyCols: Seq[String],
      watermark: String
  ): DataFrame =
    samples
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols :+ eventTimeCol)

  /** The curation chain's streaming prefix (stages 1–5 of
    * [[graft.ops.Curation]]) for ingest-time admission control — a
    * document stream is screened as it arrives instead of in a nightly
    * batch. Stage-for-stage mapping:
    *
    *  - quality + repetition gates: the SAME `gatePredicate` Column as
    *    batch (stateless kernel filter);
    *  - decontamination: a per-row overlap kernel built ONCE at plan
    *    build by [[graft.ops.Decontaminate.rowOverlapCount]] — no
    *    streaming aggregation, no join state — with the batch path's
    *    gated plan selection: exact broadcast set when the bench fits
    *    the broadcast byte model, Bloom probe (no false negatives,
    *    ~fpp count inflation) when it doesn't, fail-fast past the
    *    clamped bloom capacity;
    *  - exact dedup: `dropDuplicatesWithinWatermark` on the content md5
    *    — keep-FIRST-ARRIVAL, and only within the watermark horizon
    *    (batch keep-first = min doc_id over all time; the difference is
    *    inherent to unbounded streams and stated, not hidden);
    *  - mixture sampling: the same deterministic hash filter (stateless,
    *    so retries/replays keep or drop the same docs — exactly why
    *    rand() was never an option).
    *
    * Packing (stage 6) is a global prefix sum — inherently batch; run it
    * over the materialized screened table. */
  def curateStream(
      docStream: DataFrame,
      bench: DataFrame,
      cfg: graft.ops.Curation.Config,
      eventTimeCol: String,
      watermark: String
  ): DataFrame = {
    val overlap = graft.ops.Decontaminate
      .rowOverlapCount(bench, cfg.decontaminateK, col("text"))
    docStream
      .where(graft.ops.Curation.gatePredicate(cfg))
      .where(overlap < cfg.decontaminateMinOverlap)
      .withColumn("__content_md5", md5(col("text").cast("binary")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__content_md5"))
      .drop("__content_md5")
      .transform(graft.ops.Mixture.sample(_, cfg.weights, cfg.salt))
  }

  /** Near-dup admission control at ingest — the screening stage
    * [[curateStream]]'s exact-dedup watermark cannot provide: each
    * micro-batch of a document stream is screened against a PERSISTED
    * corpus band index, flagging band-collision (or, with `minJaccard`,
    * signature-verified) near-duplicates exactly as
    * [[graft.ops.IncrementalDedup.screen]]/`screenVerified` do in batch.
    *
    * The shape is a batch-per-trigger join (`foreachBatch`), not a
    * streaming join: a doc-level verdict is an EXISTS over the doc's
    * band buckets — a per-batch distinct over collision rows, which is
    * an aggregate, not cross-batch state. Inside the callback the
    * micro-batch IS a batch DataFrame, so the batch operator runs
    * UNCHANGED — same broadcast-batch-probes-the-index plan (the corpus
    * side never shuffles), same contracts, and stream/batch parity
    * holds by construction instead of by a re-implementation
    * (StreamingSpec drives it over multiple triggers regardless).
    *
    * `dup_within_new` is scoped to the micro-batch. Exact cross-batch
    * dups are the upstream watermark-dedup stage's job; cross-batch
    * NEAR-dup state would be an unbounded in-flight signature store —
    * the supported contract is the batch path's append cycle
    * ([[graft.ops.IncrementalDedup.admit]]ted rows join the corpus and
    * their band rows join the index between triggers). `corpusIndex`
    * is BY-NAME for exactly that cycle: a `DataFrame` from
    * `spark.read.parquet(path)` pins its file listing when it is
    * CREATED, so a pre-built frame would silently keep screening
    * against the launch-time index forever; re-evaluating the argument
    * each trigger (`spark.read.parquet(path)` again) picks appended
    * index files up live. StreamingSpec's append-cycle test drives
    * both facts: an admit-append between triggers is seen, and the
    * sibling stale-frame pitfall is pinned.
    *
    * The micro-batch is persisted for the callback's duration: the
    * screen consumes it from several plan branches, and an unpersisted
    * foreachBatch frame RE-RUNS the upstream stream stages (gates,
    * decontamination, dedup state reads) once per consumer. The cache
    * is trigger-sized and released before the trigger commits — the
    * opposite trade from the batch screen's documented no-persist
    * choice, because there the recompute is one kernel pass, here it
    * is the whole upstream chain. (Measured on scale10/CurateBench:
    * 809 → 1473 docs/s sustained.)
    *
    * Returns a writer; the caller sets trigger/checkpoint and starts.
    * `sink` receives each screened micro-batch (doc_id + both flags,
    * the [[graft.ops.IncrementalDedup.screen]] schema). */
  def nearDupScreenStream(
      docStream: DataFrame,
      corpusIndex: => DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int,
      minJaccard: Option[Double]
  )(sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
      val b = batch.toDF().persist()
      try {
        val idx = corpusIndex // fresh evaluation per trigger (see scaladoc)
        val screened = minJaccard match {
          case Some(j) =>
            graft.ops.IncrementalDedup.screenVerified(
              b, idx, k, numHashes, rowsPerBand, j)
          case None =>
            graft.ops.IncrementalDedup.screen(
              b, idx, k, numHashes, rowsPerBand)
        }
        sink(screened)
      } finally b.unpersist()
    }

  /** Ingestion-telemetry anomaly flags on a live stream — the
    * train-batch / score-stream split of [[graft.ops.Anomaly]]: per-group
    * mean/σ are FIT OFFLINE on a reference corpus (the batch operator's
    * stats), collapsed to a literal lookup (groups are bounded — event
    * types, sources), and every streamed row is a stateless map-side
    * compare. No state store, no shuffle, works in append mode with any
    * trigger; retraining is redeploying the stats map — the same
    * model-as-constant shape as the LM scoring joins. */
  def zscoreFlagStream(
      events: DataFrame,
      referenceStats: Map[String, (Double, Double)], // group → (mean, std)
      valueCol: String,
      groupCol: String,
      k: Double = 3.0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val mean = element_at(typedLit(referenceStats.view.mapValues(_._1).toMap), col(groupCol))
    val std = element_at(typedLit(referenceStats.view.mapValues(_._2).toMap), col(groupCol))
    events
      .withColumn("__mean", mean)
      .withColumn("__std", std)
      .where(col("__std").isNotNull && col("__std") > 0.0 &&
        abs(col(valueCol) - col("__mean")) > lit(k) * col("__std"))
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__std"), 4))
      .withColumn("group_mean", round(col("__mean"), 4))
      .drop("__mean", "__std")
  }

  /** Collapse [[graft.ops.Anomaly]]'s per-group stats frame to the
    * literal map [[zscoreFlagStream]] embeds (driver-side, bounded by
    * group cardinality). */
  def fitZscoreStats(
      events: DataFrame,
      valueCol: String,
      groupCol: String
  ): Map[String, (Double, Double)] = {
    val dec = col(valueCol).cast("decimal(18,2)")
    events
      .groupBy(col(groupCol))
      .agg(
        count(dec).as("n"), // parsed values only — the Anomaly.zscoreFlags n contract
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("sq"))
      .where(col("n") > 0)
      .collect()
      .map { r =>
        val n = r.getLong(1).toDouble
        val mean = r.getDouble(2) / n
        val std = math.sqrt(math.max(r.getDouble(3) / n - mean * mean, 0.0))
        r.getString(0) -> (mean, std)
      }
      .toMap
  }

  /** Spectral features at ingest — [[graft.dsp.Spectral.windowBandPower]]
    * per micro-batch (the batch-per-trigger recipe of
    * [[nearDupScreenStream]]: inside foreachBatch the micro-batch IS a
    * batch DataFrame, so the operator runs UNCHANGED and stream/batch
    * parity holds by construction). Windows are scoped to the TRIGGER:
    * a window straddling two triggers is dropped by the operator's own
    * complete-window rule, not half-computed — the right behavior for
    * telemetry features (cross-trigger windows would need an unbounded
    * in-flight sample store; batch over the stored stream is the
    * supported path for exact global windows, as with near-dup state). */
  def bandPowerStream(
      signal: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      windowSize: Int,
      bands: Seq[(String, Int, Int)]
  )(sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    signal.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
      sink(graft.dsp.Spectral.windowBandPower(
        batch.toDF(), keyCols, orderCols.map(col(_).asc), valueCol, windowSize, bands))
    }

  /** Event for the streaming funnel: `user` did `step` at epoch-µs `ts`. */
  final case class FunnelEvent(user: String, ts: Long, step: String)

  /** A funnel step advance: `user` reached 1-based `step_idx` at `ts`.
    * Emitted at most once per (user, step). */
  final case class StepReached(user: String, step_idx: Int, step_name: String, ts: Long)

  /** Streaming twin of [[graft.ops.Funnel.conversion]]: the live
    * ingest-acceptance monitor (fetched → parsed → kept per user/shard)
    * emitting a [[StepReached]] row the moment a user advances a step —
    * the append-mode event feed a dashboard counts per step (each user
    * emits each step at most once, so `count by step_idx` IS the batch
    * operator's `n_users` column; StreamingSpec pins that parity).
    *
    * Same greedy-earliest semantics as batch: t₁ = the user's first
    * step-1 event; tₖ = the first step-k event STRICTLY after tₖ₋₁ and
    * within `maxSpanUs` of t₁. With per-user in-order delivery across
    * micro-batches (the [[gapFillStream]] precondition; within a batch
    * rows are sorted by ts) first-seen ≡ earliest, so the streaming
    * advance decisions match the batch window closed form exactly.
    * State is O(steps) epoch-µs longs per user — bounded, independent
    * of event volume. */
  def funnelStream(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      maxSpanUs: Long
  ): Dataset[StepReached] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate step names: $steps")
    require(maxSpanUs > 0, s"maxSpanUs must be positive, got $maxSpanUs")
    import events.sparkSession.implicits._
    val stepIdx: Map[String, Int] = steps.zipWithIndex.toMap
    val nSteps = steps.size
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[Seq[Long], StepReached](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Seq[Long]]) =>
          // state: per-step reached ts, -1 = unreached
          val t = state.getOption.map(_.toArray).getOrElse(Array.fill(nSteps)(-1L))
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: FunnelEvent, b: FunnelEvent) => a.ts < b.ts)
          val out = scala.collection.mutable.ArrayBuffer.empty[StepReached]
          arr.foreach { e =>
            stepIdx.get(e.step) match {
              case Some(i) if t(i) < 0 =>
                val advances =
                  if (i == 0) true
                  else t(i - 1) >= 0 && e.ts > t(i - 1) && e.ts <= t(0) + maxSpanUs
                if (advances) {
                  t(i) = e.ts
                  out += StepReached(user, i + 1, steps(i), e.ts)
                }
              case _ => ()
            }
          }
          state.update(t.toSeq)
          out.iterator
      }
  }

  /** Sample for the streaming CUSUM drift monitor. */
  final case class CusumSample(key: String, ts: Long, value: Double)

  /** A CUSUM alarm: one of the one-sided sums exceeded `h` at `ts`. */
  final case class CusumAlarm(key: String, ts: Long, value: Double, cusum_up: Double, cusum_down: Double)

  /** Streaming twin of [[graft.ops.Anomaly.cusumFlags]]: the live
    * drift monitor over a metric stream (per-source quality score,
    * acceptance rate, token rate). Batch derives the Page recurrence
    * through a prefix-sum/running-min closed form; here the recurrence
    * runs DIRECTLY in per-key state — S⁺ ← max(0, S⁺ + v − target −
    * slack), S⁻ ← max(0, S⁻ + target − v − slack) — with the same
    * DECIMAL(2dp) arithmetic (state is exact cent-scaled longs, values
    * HALF_UP-rounded on entry exactly like the batch `cast` to
    * decimal(18,2)), so a replayed stream produces the identical alarm
    * rows (StreamingSpec pins the parity). Emits only rows where a
    * side exceeds `h` (the batch filter). State: two longs per key.
    * Requires per-key in-order delivery across micro-batches; rows are
    * sorted by ts within each batch. */
  def cusumStream(
      samples: Dataset[CusumSample],
      target: java.math.BigDecimal,
      slack: java.math.BigDecimal,
      h: java.math.BigDecimal
  ): Dataset[CusumAlarm] = {
    require(slack.signum >= 0, s"slack must be >= 0, got $slack")
    require(h.signum > 0, s"h must be positive, got $h")
    import samples.sparkSession.implicits._
    def cents(b: java.math.BigDecimal): Long =
      b.setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val targetC = cents(target); val slackC = cents(slack); val hC = cents(h)
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Long)]) =>
          var (su, sd) = state.getOption.getOrElse((0L, 0L))
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: CusumSample, b: CusumSample) => a.ts < b.ts)
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumAlarm]
          arr.foreach { s =>
            // valueOf = shortest-repr based, matching Spark's
            // double→decimal cast (a raw `new BigDecimal(double)` would
            // use the exact binary expansion and flip .xx5 boundaries)
            val vC = cents(java.math.BigDecimal.valueOf(s.value))
            su = math.max(0L, su + vC - targetC - slackC)
            sd = math.max(0L, sd + targetC - vC - slackC)
            if (su > hC || sd > hC)
              out += CusumAlarm(key, s.ts, vC / 100.0, su / 100.0, sd / 100.0)
          }
          state.update((su, sd))
          out.iterator
      }
  }

  /** One (segment × bucket) contribution from the streaming TWAP:
    * exact cent-scaled value mass (`vsum_cents = value_cents · dur_us`)
    * over `dur_us` covered micros of the bucket. A downstream rollup
    * by (key, bucket_start) yields the running TWAP:
    * `(Σ vsum_cents / 100.0) / Σ dur_us`. */
  final case class TwapSeg(key: String, bucket_start: Long, dur_us: Long, vsum_cents: Long)

  /** Streaming twin of [[graft.ts.Twap.twap]]: per-key step
    * interpolation as keyed state — an observation's segment CLOSES
    * when the next observation arrives (end = `min(next_ts,
    * ts + maxHoldUs)`, the batch staleness rule), and the closed
    * segment emits its per-bucket contributions immediately. The
    * still-open last segment per key emits nothing (a stream cannot
    * know its end); batch parity therefore holds over CLOSED segments
    * — StreamingSpec pins that the streamed rollup equals the batch
    * operator run on the same rows once a flush tick closes each key
    * (restricted to buckets before the tick's own).
    *
    * Values enter as exact cents (the [[cusumStream]] decimal recipe,
    * matching batch's `cast` to DECIMAL(18,2)); contributions are
    * integer `cents · micros`, so micro-batch slicing cannot change
    * any sum. State: one (ts, cents) pair per key. Requires per-key
    * in-order delivery across micro-batches; rows are sorted by ts
    * within each batch. */
  def twapStream(
      samples: Dataset[Sample],
      bucketUs: Long,
      maxHoldUs: Long
  ): Dataset[TwapSeg] = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(maxHoldUs >= 1, s"maxHoldUs must be >= 1, got $maxHoldUs")
    import samples.sparkSession.implicits._
    def cents(d: Double): Long =
      java.math.BigDecimal.valueOf(d)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), TwapSeg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Long)]) =>
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: Sample, b: Sample) => a.ts < b.ts)
          var carried: Option[(Long, Long)] = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[TwapSeg]
          arr.foreach { s =>
            carried match {
              case Some((pt, pv)) =>
                val e = math.min(s.ts, pt + maxHoldUs)
                if (e > pt) {
                  var b = Math.floorDiv(pt, bucketUs)
                  val bLast = Math.floorDiv(e - 1, bucketUs)
                  while (b <= bLast) {
                    val lo = math.max(pt, b * bucketUs)
                    val hi = math.min(e, (b + 1) * bucketUs)
                    out += TwapSeg(key, b * bucketUs, hi - lo, pv * (hi - lo))
                    b += 1
                  }
                }
              case None => ()
            }
            carried = Some((s.ts, cents(s.value)))
          }
          carried.foreach(state.update)
          out.iterator
      }
  }

  /** Event for the streaming cohort monitor: `user` active at epoch-µs `ts`. */
  final case class UserActivity(user: String, ts: Long)

  /** First activity of a user in a retention cell: emitted once per
    * (user, period_offset); `cohort_period` is the period of the
    * user's first event. */
  final case class CohortActive(user: String, cohort_period: Long, period_offset: Long)

  /** Streaming twin of [[graft.ops.Funnel.retention]]: emits a
    * [[CohortActive]] row the FIRST time a user is active in each
    * period offset from their cohort (the period of their first-ever
    * event). Because each (user, offset) emits exactly once, a
    * downstream `count by (cohort_period, period_offset)` IS the batch
    * operator's `n_active` distinct-user column — StreamingSpec pins
    * that parity. Same subtract-mod period arithmetic as batch (exact
    * for any epoch-µs value).
    *
    * State per user: the cohort period plus the set of offsets already
    * emitted — bounded by the number of PERIODS the stream has lived
    * (weeks of a weekly cohort monitor), not by event volume. Requires
    * per-user in-order delivery across micro-batches only for the
    * cohort assignment (a user's first-ever event must arrive first);
    * within a batch rows are sorted by ts. */
  def cohortStream(
      events: Dataset[UserActivity],
      periodUs: Long
  ): Dataset[CohortActive] = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[Seq[Long], CohortActive](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Seq[Long]]) =>
          // same remainder semantics as the batch operator's
          // `(c - c % p) / p` (Spark % = JVM %, sign of the dividend)
          def periodOf(ts: Long): Long = (ts - ts % periodUs) / periodUs
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: UserActivity, b: UserActivity) => a.ts < b.ts)
          // state layout: head = cohort period, tail = emitted offsets
          val prev = state.getOption
          var cohort = prev.map(_.head).getOrElse(periodOf(arr.head.ts))
          val seen = scala.collection.mutable.Set.empty[Long]
          prev.foreach(s => seen ++= s.tail)
          val out = scala.collection.mutable.ArrayBuffer.empty[CohortActive]
          arr.foreach { e =>
            val off = periodOf(e.ts) - cohort
            if (off >= 0 && !seen.contains(off)) {
              seen += off
              out += CohortActive(user, cohort, off)
            }
          }
          state.update(cohort +: seen.toSeq.sorted)
          out.iterator
      }
  }

  /** W3 censor as arbitrary stateful processing: per key, keep a
    * detection only if it is ≥ `width` after the last KEPT one. State is
    * one Long per key. Requires per-key in-order delivery within a batch
    * (detections are sorted inside each batch group; cross-batch order
    * is the caller's contract, as in the reference's generator chain). */
  def censorStream(
      detections: Dataset[Detection],
      width: Long
  ): Dataset[Kept] = {
    import detections.sparkSession.implicits._
    detections
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Kept](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Long]) =>
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(_.idx).flatMap { d =>
            if (lastKept == Long.MinValue || d.idx - lastKept >= width) {
              lastKept = d.idx
              Some(Kept(key, d.idx))
            } else None
          }
          state.update(lastKept)
          out.iterator
      }
  }

  /** A change-row for the streaming CDC compactor. `ord` must totally
    * order versions within a key (change timestamp, or timestamp
    * scaled + a sequence). */
  final case class ChangeRow(key: Long, ord: Long, op: String, value: Double)

  /** One snapshot update: the key's new current version the moment it
    * changes; `deleted = true` means the winning version is a
    * tombstone (downstream removes the key). */
  final case class SnapshotUpdate(key: Long, ord: Long, op: String, value: Double, deleted: Boolean)

  /** Streaming twin of [[graft.ops.Changelog.compact]]: the live
    * merge-on-read view of a changelog — a [[SnapshotUpdate]] is
    * emitted the moment a key's current version changes, forming the
    * CDC-out feed a downstream serving table applies in order. An
    * out-of-order older version (ord ≤ current) is absorbed silently —
    * exactly the argmax semantics of the batch operator, so the LAST
    * emission per key over any prefix of the stream equals the batch
    * `compact` of that prefix (tombstoned keys appear with
    * `deleted = true` instead of being absent — a stream cannot
    * retract silence; StreamingSpec pins the parity).
    *
    * State is one (ord, op, value) per key — the snapshot itself, the
    * floor for ANY latest-state operator; no per-version history is
    * ever held. */
  def compactStream(
      changes: Dataset[ChangeRow],
      deleteOps: Set[String]
  ): Dataset[SnapshotUpdate] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, String, Double), SnapshotUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, String, Double)]) =>
          var cur = state.getOption.orNull
          var changed = false
          // STRICT lexicographic (ord, op, value) win — the batch
          // struct-max field order; a replayed duplicate of the
          // current version compares equal and is a no-op. op compares
          // by UTF-8 BYTE order (UTF8String), matching how the batch
          // max(struct(...)) orders strings — Java String `>` is
          // UTF-16 code-unit order, which diverges for supplementary
          // characters.
          def opGt(a: String, b: String): Boolean =
            org.apache.spark.unsafe.types.UTF8String.fromString(a)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) > 0
          rows.foreach { r =>
            val wins = cur == null || r.ord > cur._1 ||
              (r.ord == cur._1 &&
                (opGt(r.op, cur._2) || (r.op == cur._2 && r.value > cur._3)))
            if (wins) { cur = (r.ord, r.op, r.value); changed = true }
          }
          if (changed) {
            state.update(cur)
            Iterator.single(
              SnapshotUpdate(key, cur._1, cur._2, cur._3, deleteOps.contains(cur._2)))
          } else Iterator.empty
      }
  }

  /** Closed ripple/burst event from [[burstStream]]. */
  final case class BurstOut(
      key: String, start_ts: Long, stop_ts: Long, n_samples: Long, peak: Double)

  /** Streaming twin of [[graft.ts.Burst.detect]] — the live ripple
    * monitor: fixed hysteresis thresholds (`hi`/`lo` come from a
    * batch-calibrated baseline, the deployment form of the batch op's
    * per-key μ + k·σ), merge-gap and min-duration semantics identical
    * to batch over unit-spaced per-key sample streams.
    *
    * Emission is confirm-on-progress (the [[twapStream]] discipline):
    * a qualified event emits only once a later sample proves nothing
    * can merge into it — any sample whose position is ≥ mergeGap past
    * the event's end (below-threshold tick or the start of the next
    * run). Replaying a prefix therefore never emits an event a longer
    * prefix would have merged; StreamingSpec pins prefix parity with
    * the batch operator via flush ticks.
    *
    * State per key: the open run and at most one pending qualified
    * event — O(1), independent of stream length. Values are held as
    * exact cents (the 2dp contract shared with [[twapStream]]), so
    * peaks compare identically to batch decimals. */
  def burstStream(
      samples: Dataset[Sample],
      hi: Double,
      lo: Double,
      mergeGapSamples: Long,
      minSamples: Long
  ): Dataset[BurstOut] = {
    require(hi >= lo, s"hi ($hi) must be >= lo ($lo)")
    import samples.sparkSession.implicits._
    def cents(d: Double): Long =
      java.math.BigDecimal.valueOf(d)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    // state: (runStart, runEnd, runHasHi, runPeakCents,
    //         pendStart, pendEnd, pendPeakCents, hasPend)
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[
        (Long, Long, Boolean, Long, Long, Long, Long, Boolean), BurstOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows,
          state: GroupState[(Long, Long, Boolean, Long, Long, Long, Long, Boolean)]) =>
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: Sample, b: Sample) => a.ts < b.ts)
          var (rs, re, rHi, rPeak, ps, pe, pPeak, hasPend) =
            state.getOption.getOrElse((-1L, -1L, false, 0L, 0L, 0L, 0L, false))
          var hasRun = rs >= 0
          val out = scala.collection.mutable.ArrayBuffer.empty[BurstOut]
          def flushPend(): Unit = {
            if (hasPend && pe - ps + 1 >= minSamples)
              out += BurstOut(key, ps, pe, pe - ps + 1, pPeak / 100.0)
            hasPend = false
          }
          def closeRun(): Unit = {
            if (hasRun && rHi) {
              if (hasPend && rs - pe - 1 < mergeGapSamples) {
                pe = re; pPeak = math.max(pPeak, rPeak)
              } else {
                flushPend()
                ps = rs; pe = re; pPeak = rPeak; hasPend = true
              }
            }
            hasRun = false
          }
          arr.foreach { s =>
            val c = cents(s.value)
            val v = c / 100.0
            if (v > lo) {
              if (hasRun && s.ts == re + 1) {
                re = s.ts; rHi = rHi || v > hi; rPeak = math.max(rPeak, c)
              } else {
                closeRun()
                // a run starting ≥ mergeGap past the pending end proves
                // the pending event final
                if (hasPend && s.ts - pe - 1 >= mergeGapSamples) flushPend()
                hasRun = true; rs = s.ts; re = s.ts; rHi = v > hi; rPeak = c
              }
            } else {
              closeRun()
              // any future run starts at ≥ ts + 1
              if (hasPend && s.ts - pe >= mergeGapSamples) flushPend()
            }
          }
          state.update((if (hasRun) rs else -1L, re, rHi, rPeak, ps, pe, pPeak, hasPend))
          out.iterator
      }
  }

  /** One smoothed sample from [[ewmaStream]] — the live control-chart
    * point: truncated-EWMA value, deviation of the sample from the
    * PRIOR smoothed value (None for a key's first sample), alarm. */
  final case class EwmaPoint(
      key: String, ts: Long, n_taps: Int, ewma: Double,
      dev: Option[Double], alarm: Int)

  /** Streaming twin of [[graft.ts.Ewma.controlChart]]: the live
    * per-key drift monitor. The batch operator's TRUNCATION is what
    * makes the state finite — the smoothed value is a pure function
    * of the last ≤ `taps` cent values, so the keyed state is exactly
    * that window (O(taps) longs per key; a recursive float EWMA would
    * need no more state but could never replay batch's integer chain
    * bit-for-bit). The prior EWMA is recomputed from the stored
    * window before appending the new sample, so deviation/alarm
    * match batch's lag semantics exactly; every arithmetic step is
    * the same exact integer chain (tap weights, sign-aware half-up
    * micro division, integer alarm compare).
    *
    * Emits one [[EwmaPoint]] per input row. Requires per-key in-order
    * delivery across micro-batches (rows are sorted by ts within each
    * batch); batch parity over any prefix is pinned in StreamingSpec.
    *
    * TS-UNIQUENESS CONTRACT: batch `controlChart` tie-breaks equal
    * timestamps on its `idCol`; [[Sample]] carries no id, so rows with
    * TIED (key, ts) fold here in micro-batch arrival order, which may
    * differ from batch's (ts, id) order. The bit-for-bit parity
    * contract therefore requires timestamps unique per key — the
    * natural shape for a sampled metric stream. Feeds with legitimate
    * ts ties must pre-aggregate (or disambiguate ts) upstream.
    */
  def ewmaStream(
      samples: Dataset[Sample],
      taps: Int = 8,
      alphaNum: Int = 1,
      alphaDen: Int = 4,
      thresholdMicro: Long = 200000000L
  ): Dataset[EwmaPoint] = {
    require(taps >= 1 && taps <= 32, s"taps must be in [1,32], got $taps")
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    // same overflow guard as batch Ewma.controlChart: Ewma.weights
    // narrows BigInt → Long, so an unguarded taps/alphaDen pair (e.g.
    // taps=20, alphaDen=10) would silently wrap Long here while batch
    // rejects it loudly — breaking the documented bit-for-bit parity
    require(BigInt(alphaDen).pow(taps - 1) * taps <
        BigInt(Long.MaxValue) / 10000000L / 10000L / 2,
      s"taps=$taps alphaDen=$alphaDen overflows the exact integer chain")
    import samples.sparkSession.implicits._
    val ws = graft.ts.Ewma.weights(taps, alphaNum, alphaDen)
    def cents(d: Double): Long =
      java.math.BigDecimal.valueOf(d)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    // sign-aware half-up micro division — the batch microHalfUp
    def halfUp(num: Long, den: Long): Long =
      if (num >= 0) (num * 2 + den) / (den * 2)
      else -(((-num) * 2 + den) / (den * 2))
    // window = most-recent-first cent values, length ≤ taps
    def ewmaMicro(window: List[Long]): Long = {
      var num = 0L; var den = 0L; var k = 0
      window.foreach { c => num += ws(k) * c; den += ws(k); k += 1 }
      halfUp(num * 10000L, den)
    }
    samples
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[Long], EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[List[Long]]) =>
          var window = state.getOption.getOrElse(Nil)
          val arr = rows.toArray
          scala.util.Sorting.stableSort(arr, (a: Sample, b: Sample) => a.ts < b.ts)
          val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
          arr.foreach { s =>
            val c = cents(s.value)
            val prior = if (window.isEmpty) None else Some(ewmaMicro(window))
            window = (c :: window).take(taps)
            val em = ewmaMicro(window)
            val devMicro = prior.map(p => c * 10000L - p)
            out += EwmaPoint(key, s.ts, window.length, em / 1e6,
              devMicro.map(_ / 1e6),
              if (devMicro.exists(d => math.abs(d) > thresholdMicro)) 1 else 0)
          }
          state.update(window)
          out.iterator
      }
  }
}
