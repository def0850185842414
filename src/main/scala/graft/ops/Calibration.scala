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
}
