package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-score calibration diagnostics — the reliability check a
  * pipeline runs on its quality/toxicity/language classifier before
  * trusting the scores as sampling weights or gate thresholds:
  *
  *  - [[reliabilityBins]]: equal-width score bins with per-bin count,
  *    positive count, and exact-decimal score mass — the reliability
  *    diagram's data, as integers/decimals (accuracy = n_pos/n,
  *    confidence = score_sum/n are one division away; shipping them
  *    pre-divided would put a float boundary between engines);
  *  - [[ece]]: expected calibration error. The textbook
  *    Σ (n_b/n)·|acc_b − conf_b| telescopes to
  *    `Σ_b |n_pos_b − score_sum_b| / n` — one exact rational, so the
  *    operator computes it DECIMAL-exact end to end and rounds once
  *    (6dp half-up), never accumulating float error across bins.
  *
  * One map-side-combinable bin rollup (+ one singleton fold for ece)
  * — bounded by the bin count at any corpus size.
  */
object Calibration {

  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Bin index for a score in [0, 1]: floor(score·nBins), score = 1.0
    * clamped into the last bin. Scores are read at 4dp DECIMAL (the
    * declared score precision — callers emitting raw doubles round
    * here, both engines the same way), so bin edges are exact: a
    * score of 0.2500 lands in bin 1 of 4 on every engine. Shared with
    * the streaming twin ([[graft.streaming.Streaming.reliabilityStream]]). */
  private[graft] def binOf(score: Column, nBins: Int): Column =
    least(floor(score.cast("decimal(9,4)") * nBins).cast("long"), lit(nBins - 1L))

  /** In-plan guard: fail loud on scores outside [0, 1] (a classifier
    * emitting them is broken — mis-binning would be silent). Shared
    * with the streaming twin. */
  private[graft] def guardScores(df: DataFrame, scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("decimal(9,4)")
    df.where(
      when(s.isNull || s < 0 || s > 1,
        raise_error(lit(s"Calibration: score outside [0, 1] in $scoreCol")))
        .otherwise(lit(true)))
  }

  /** The per-bin aggregate battery (n, n_pos, exact 4dp score mass) —
    * shared verbatim by the batch rollup and the streaming twin so
    * both walk the identical count/sum chain. */
  private[graft] def binAggs(scoreCol: String, labelCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(when(col(labelCol).cast("int") === 1, 1L).otherwise(0L)).as("n_pos"),
    sum(col(scoreCol).cast("decimal(9,4)")).as("score_sum"))

  /** 6dp half-up of the exact rational `d / n` (d a non-negative 4dp
    * DECIMAL), as a double — the ece's single rounding step, shared
    * with the streaming twin. */
  private[graft] def eceFromTotals(d: Column, n: Column): Column = {
    val u = (d * lit(1000000)).cast("decimal(38,0)")
    val micro = intDiv(u * 2 + n, n * 2)
    micro.cast("double") / lit(1000000.0)
  }

  /** Per equal-width bin over `[0,1]`: `bin` (0-based), `n`, `n_pos`
    * (label = 1/true), `score_sum` (exact 4dp DECIMAL). Scores
    * outside [0, 1] are rejected in-plan (a classifier emitting them
    * is broken — fail loud, not mis-bin). */
  def reliabilityBins(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int
  ): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    guardScores(scored, scoreCol)
      .withColumn("bin", binOf(col(scoreCol), nBins))
      .groupBy("bin")
      .agg(binAggs(scoreCol, labelCol).head, binAggs(scoreCol, labelCol).tail: _*)
  }

  /** Expected calibration error over `nBins` equal-width bins, as ONE
    * row `(n, ece)` with ece 6dp half-up of the exact rational
    * `Σ_b |n_pos_b − score_sum_b| / n`. */
  def ece(scored: DataFrame, scoreCol: String, labelCol: String, nBins: Int): DataFrame = {
    val bins = reliabilityBins(scored, scoreCol, labelCol, nBins)
    val diff = abs(col("n_pos").cast("decimal(38,4)") - col("score_sum"))
    bins
      .agg(sum(col("n")).as("n"), sum(diff).as("__d"))
      // 6dp half-up of __d / n (__d ≥ 0 by construction; its 4dp
      // fraction is exactly absorbed by the 10^6 micro-scaling)
      .withColumn("ece", eceFromTotals(col("__d"), col("n")))
      .select("n", "ece")
  }

  /** Split-conformal prediction for a binary probabilistic classifier
    * (Vovk et al.; the Angelopoulos-Bates recipe): from a held-out
    * calibration set, the quantile threshold q̂ = the
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score
    * `s = 1 − p if label = 1 else p`, then the marginal coverage and
    * mean prediction-set size that q̂ yields on a test set
    * (C(x) = {1 if 1−p ≤ q̂} ∪ {0 if p ≤ q̂}).
    *
    * Exactness: scores are 4dp DECIMAL (the calibration-family
    * contract), so nonconformities are exact and q̂ is an exact order
    * statistic; coverage / set size are single 6dp divisions of exact
    * integer counts. When ⌈(n+1)(1−α)⌉ > n the conformal guarantee
    * forces the full set — q̂ = 1 (the max possible nonconformity for
    * probabilities).
    *
    * Shape at scale: the rank never sorts the corpus — nonconformities
    * are rolled up per DISTINCT 4dp value (≤ 10⁴ + 1 rows by
    * construction), the cumulative rank rides that bounded frame, and
    * q̂ broadcasts to one test-side aggregate.
    */
  def conformal(
      calib: DataFrame,
      test: DataFrame,
      scoreCol: String,
      labelCol: String,
      alpha: java.math.BigDecimal
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha.signum > 0 && alpha.compareTo(java.math.BigDecimal.ONE) < 0,
      s"alpha must be in (0, 1), got $alpha")
    val oneMinus = new java.math.BigDecimal(1).subtract(alpha)
    def noncon(df: DataFrame): Column = {
      val p = col(scoreCol).cast("decimal(9,4)")
      when(col(labelCol).cast("int") === 1, lit(java.math.BigDecimal.ONE).cast("decimal(9,4)") - p)
        .otherwise(p)
    }
    // per-distinct-value rollup: the cumulative rank rides a frame
    // bounded by the 4dp score vocabulary, never the calibration set
    val byVal = guardScores(calib, scoreCol)
      .select(noncon(calib).as("s"))
      .groupBy("s")
      .agg(count(lit(1)).as("c"))
    val ordered = Window.orderBy(col("s").asc)
    val all = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val ranked = byVal
      .withColumn("cum", sum(col("c")).over(ordered.rowsBetween(Long.MinValue, 0)))
      .withColumn("n_calib", sum(col("c")).over(all))
    val qhat = ranked
      .withColumn("k", ceil((col("n_calib") + 1).cast("decimal(28,4)") * lit(oneMinus)))
      .agg(
        first(col("n_calib")).as("n_calib"),
        coalesce(
          min(when(col("cum") >= col("k"), col("s"))),
          lit(java.math.BigDecimal.ONE).cast("decimal(9,4)")).as("qhat"))
    // test side rolls up to the bounded (p, y) vocabulary FIRST (one
    // map-side-combinable aggregate over the corpus), so everything
    // downstream only ever touches ≤ 2·10⁴+1 rows
    val tRoll = guardScores(test, scoreCol)
      .groupBy(
        col(scoreCol).cast("decimal(9,4)").as("p"),
        col(labelCol).cast("int").as("y"))
      .agg(count(lit(1)).as("c"))
    // q̂ attaches by UNION + unbounded window over the bounded frame —
    // no join at all (a constant-key join here would optimize into the
    // nested-loop cross join this library bans)
    val combined = tRoll
      .select(col("p"), col("y"), col("c"),
        lit(null).cast("long").as("n_calib"),
        lit(null).cast("decimal(9,4)").as("qhat"))
      .unionByName(qhat.select(
        lit(null).cast("decimal(9,4)").as("p"),
        lit(null).cast("int").as("y"),
        lit(null).cast("long").as("c"),
        col("n_calib"), col("qhat")))
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    combined
      .withColumn("n_calib", max(col("n_calib")).over(whole))
      .withColumn("qhat", max(col("qhat")).over(whole))
      .where(col("p").isNotNull)
      .select(
        col("n_calib"), col("qhat"), col("c"),
        // set membership: exact decimal comparisons against q̂
        (lit(java.math.BigDecimal.ONE).cast("decimal(9,4)") - col("p") <= col("qhat"))
          .cast("int").as("in1"),
        (col("p") <= col("qhat")).cast("int").as("in0"),
        col("y"))
      .groupBy("n_calib", "qhat")
      .agg(
        sum(col("c")).as("n_test"),
        sum(when(col("y") === 1, col("in1")).otherwise(col("in0")) * col("c")).as("__cov"),
        sum((col("in0") + col("in1")) * col("c")).as("__sz"))
      .select(
        col("n_calib"),
        col("qhat").cast("double").as("qhat"),
        col("n_test"),
        round(col("__cov").cast("double") / col("n_test").cast("double"), 6).as("coverage"),
        round(col("__sz").cast("double") / col("n_test").cast("double"), 6).as("avg_set_size"))
  }

  /** One fitted isotonic step: every row scoring exactly
    * `score_micro` (4dp score × 10⁴... scaled to micro ×10⁶ — see
    * [[isotonicFit]]) calibrates to `cal_micro` (10⁻⁶-scaled pooled
    * positive rate). Steps are non-decreasing in score AND value. */
  final case class IsoStep(scoreMicro: Long, n: Long, nPos: Long, calMicro: Long)

  /** Pool-adjacent-violators isotonic regression of label on score —
    * the standard calibration FIT (Zadrozny & Elkan 2002): the
    * monotone step function closest to the empirical positive rates.
    * Platt scaling needs an optimizer; PAV is exact.
    *
    * Distributed part: ONE (distinct 4dp score) rollup — bounded by
    * the score vocabulary (≤ 10⁴ per unit, the repo's score
    * contract), collected under a LOUD `maxDistinct` cap. The PAV
    * stack then runs driver-side on that bounded table (the
    * trained-artifact recipe: k-means / BPE / DSIR train the same
    * way) in EXACT integers — a violation is the cross-multiply
    * prevPos·curN > curPos·prevN, pool means merge as (Σpos, Σn)
    * pairs, and each pool's calibrated value is the 6dp half-up of
    * the exact rational pos/n. Scores outside [0, 1] fail loud
    * ([[guardScores]]).
    *
    * Returns the fitted steps sorted by score — apply with
    * [[isotonicTable]] (a broadcastable score → value map; the
    * deployment artifact). */
  def isotonicFit(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      maxDistinct: Int = 100000
  ): Seq[IsoStep] = {
    val rows = guardScores(scored, scoreCol)
      .groupBy((col(scoreCol).cast("decimal(9,4)") * 1000000).cast("long").as("__s"))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col(labelCol).cast("int") === 1, 1L).otherwise(0L)).as("__p"))
      .orderBy("__s")
      .collect()
    require(rows.length <= maxDistinct,
      s"isotonicFit: ${rows.length} distinct scores exceed maxDistinct=$maxDistinct " +
        "— coarsen the score precision first")
    // PAV stack: (scoreStartIdx, sumN, sumPos) pools, exact integers
    final case class Pool(fromIdx: Int, n: Long, pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    rows.zipWithIndex.foreach { case (r, i) =>
      pools += Pool(i, r.getLong(1), r.getLong(2))
      // merge while the previous pool's mean EXCEEDS the last's
      // (non-decreasing fit): prevPos/prevN > curPos/curN cross-mult
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val b = pools.last
        a.pos * b.n > b.pos * a.n
      }) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += Pool(a.fromIdx, a.n + b.n, a.pos + b.pos)
      }
    }
    val out = Array.ofDim[IsoStep](rows.length)
    pools.zipWithIndex.foreach { case (p, pi) =>
      val untilIdx = if (pi == pools.length - 1) rows.length else pools(pi + 1).fromIdx
      val cal = {
        val u = p.pos * 1000000L
        (u * 2 + p.n) / (p.n * 2) // pos ≥ 0: single-branch half-up
      }
      (p.fromIdx until untilIdx).foreach { i =>
        out(i) = IsoStep(rows(i).getLong(0), rows(i).getLong(1), rows(i).getLong(2), cal)
      }
    }
    out.toSeq
  }

  /** SERVE a fitted isotonic map ([[isotonicFit]]) onto a scored
    * corpus — the deployment half of the calibration lane: each row's
    * 4dp score looks up its pooled calibrated value through ONE
    * broadcast equi-join on the exact micro-integer score key (the
    * fitted table is bounded by the 4dp score vocabulary, ≤ 10⁴ per
    * unit — always broadcastable; the corpus never shuffles).
    *
    * Semantics (the [[graft.streaming.Streaming.seasonalScoreStream]]
    * convention): rows whose 4dp score bucket was NOT seen at fit
    * time DROP — an unseen bucket has no pooled rate, and serving a
    * nearest-step guess silently would hide train/serve drift; gate
    * with [[graft.ops.Stats.psi]] instead. Scores outside [0, 1]
    * fail loud ([[guardScores]]), as at fit time.
    *
    * Works unchanged on a STREAMING `scored` frame (stateless
    * stream-static join) — [[graft.streaming.Streaming
    * .isotonicScoreStream]] is that deployment form.
    *
    * @return the input rows + `calibrated` (exact micro-derived
    *         double) */
  def isotonicScore(scored: DataFrame, scoreCol: String, fit: Seq[IsoStep]): DataFrame = {
    require(fit.nonEmpty, "isotonicScore: empty fit")
    import scored.sparkSession.implicits._
    val steps = fit.map(st => (st.scoreMicro, st.calMicro))
      .toDF("__sm", "__cm")
    guardScores(scored, scoreCol)
      .withColumn("__sm", (col(scoreCol).cast("decimal(9,4)") * 1000000).cast("long"))
      .join(broadcast(steps), "__sm")
      .withColumn("calibrated", col("__cm").cast("double") / lit(1000000.0))
      .drop("__sm", "__cm")
  }

  /** The fitted steps as a DataFrame
    * `(score, n, n_pos, calibrated)` — score and calibrated as exact
    * micro-derived doubles; broadcast-join it on the 4dp score to
    * calibrate a corpus (or a stream — the map is static). */
  def isotonicTable(spark: org.apache.spark.sql.SparkSession, fit: Seq[IsoStep]): DataFrame = {
    import spark.implicits._
    fit.toDF("scoreMicro", "n", "nPos", "calMicro")
      .select(
        (col("scoreMicro").cast("double") / lit(1000000.0)).as("score"),
        col("n").as("n"),
        col("nPos").as("n_pos"),
        (col("calMicro").cast("double") / lit(1000000.0)).as("calibrated"))
  }
}
