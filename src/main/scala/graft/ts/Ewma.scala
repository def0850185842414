package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EWMA control chart over a keyed ordered stream — the classic
  * per-entity drift/anomaly monitor (is this user's metric suddenly
  * off its own recent baseline?): an exponentially-weighted moving
  * average per key, the deviation of each sample from the PRIOR
  * smoothed value, and a fixed-threshold alarm.
  *
  * The smoother is the TRUNCATED adjust-form EWMA (pandas
  * `ewm(alpha, adjust=True)` cut at `taps` lags):
  *
  *   s_t = Σ_{k=0..taps−1} (1−α)^k · x_{t−k}  /  Σ (1−α)^k
  *
  * with α = alphaNum/alphaDen RATIONAL, so every weight
  * (alphaDen−alphaNum)^k · alphaDen^(taps−1−k) is an exact integer
  * LITERAL and the whole chain is integer arithmetic over 2dp-cent
  * values: numerator and denominator are exact longs, s_t ships as
  * the 6dp sign-aware half-up integral division both engines replay
  * bit-for-bit (the [[graft.ops.Labels]] ratio6 recipe — a recursive
  * float EWMA would diverge across engines after a few hundred
  * steps). Truncation error vs the infinite form is (1−α)^taps of
  * the mass (≈ 10% at α=¼, taps=8) — the monitor trades it for
  * BOUNDED per-row work and an O(taps) streaming-state twin
  * ([[graft.streaming.Streaming]]).
  *
  * The alarm compares |x_t·10⁴ − s_{t−1}micro| (all exact micro
  * integers — deviation is measured against the PRIOR smoothed value,
  * the control-chart convention, so a spike doesn't suppress its own
  * alarm) against `thresholdMicro`: an integer compare, no float on
  * the alert boundary. The first sample per key has no prior → NULL
  * deviation, alarm 0.
  *
  * One window pass per key computes all lags together (Spark
  * evaluates the `taps` `lag()` calls in a single ordered frame);
  * keys partition freely — no global sort, no driver state.
  *
  * Output: the key/order/id columns plus
  * `(n_taps, ewma, dev, alarm)`.
  */
object Ewma {

  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  private def microHalfUp(num: Column, den: Column): Column =
    when(num >= 0, intDiv(num * 2 + den, den * 2))
      .otherwise(-intDiv((-num) * 2 + den, den * 2))

  /** The exact integer tap weights (1−α)^k·alphaDen^(taps−1−k),
    * k = 0 … taps−1, for α = alphaNum/alphaDen. */
  private[graft] def weights(taps: Int, alphaNum: Int, alphaDen: Int): Seq[Long] = {
    val r = (alphaDen - alphaNum).toLong
    (0 until taps).map(k =>
      BigInt(r).pow(k).toLong * BigInt(alphaDen).pow(taps - 1 - k).toLong)
  }

  /** See object doc. `idCol` breaks order ties deterministically
    * (required: a tie-broken total order per key is the parity
    * contract with the streaming twin). NULL values are excluded
    * up front (they have no cent form; a gap simply shortens the
    * available tap window like a series head does). */
  def controlChart(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      valCol: String,
      taps: Int = 8,
      alphaNum: Int = 1,
      alphaDen: Int = 4,
      thresholdMicro: Long = 200000000L
  ): DataFrame = {
    require(keyCols.nonEmpty, "controlChart needs at least one key column")
    require(taps >= 1 && taps <= 32, s"taps must be in [1,32], got $taps")
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    // Σ weights ≤ taps·alphaDen^(taps−1) must leave room for the
    // worst-case chain |num|·10⁴·2 at cent values up to 10⁷ (2dp
    // metrics of magnitude ≤ 10⁵ — the repo's metric contract)
    require(BigInt(alphaDen).pow(taps - 1) * taps <
        BigInt(Long.MaxValue) / 10000000L / 10000L / 2,
      s"taps=$taps alphaDen=$alphaDen overflows the exact integer chain")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val ws = weights(taps, alphaNum, alphaDen)
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast("long")
    // Materialize each lag ONCE as a named column: Catalyst does NOT
    // dedupe repeated lag(col, k) Column instances, so spelling the
    // chains directly over lag() calls planned 243 window expressions
    // (each occurrence its own frame; the physical Window re-walked
    // every partition buffer per frame — r18 plan audit, 27× the 9
    // frames actually needed). With named columns the Window computes
    // taps frames and the chains are a plain post-window projection.
    // Arithmetic and output are bit-identical.
    val base0 = df.where(col(valCol).isNotNull).withColumn("__cents", cents)
    val base = (1 to taps).foldLeft(base0)((d, k) =>
      d.withColumn(s"__lag$k", lag(col("__cents"), k).over(w)))
    def lagK(k: Int): Column =
      if (k == 0) col("__cents") else col(s"__lag$k")
    def chain(offset: Int): (Column, Column) = {
      val lags = (0 until taps).map(k => lagK(k + offset))
      val num = lags.zip(ws).map { case (x, wk) =>
        when(x.isNotNull, x * wk).otherwise(lit(0L))
      }.reduce(_ + _)
      val den = lags.zip(ws).map { case (x, wk) =>
        when(x.isNotNull, lit(wk)).otherwise(lit(0L))
      }.reduce(_ + _)
      (num, den)
    }
    val (num, den) = chain(0)
    val nTaps = (0 until taps).map(k => lagK(k).isNotNull.cast("int")).reduce(_ + _)
    // The prior smoothed value is recomputed IN THE SAME WINDOW from
    // lags 1..taps (the identical weight chain shifted one row) rather
    // than as lag(__ewma_micro, 1) over the derived column: that
    // spelling plans a SECOND WindowExec pass that re-buffers every
    // row — measured 17.1 s vs 4.5 s at 10M rows / 150k keys
    // (tools/EwmaProbe) — while this fold keeps ONE WindowExec with
    // taps+1 offset frames. Output is bit-identical: __ewma_micro at
    // row i−1 is a pure function of cents at rows i−1−k (k < taps,
    // NULL-gated per tap), which are exactly lags 1..taps at row i;
    // rows are NULL-filtered up front, so lag(cents, 1) is NULL iff
    // row i is its key's first row — the same rows on which
    // lag(__ewma_micro, 1) is NULL.
    val (pnum, pden) = chain(1)
    val prior = when(lagK(1).isNotNull, microHalfUp(pnum * 10000L, pden))
    val devMicro = col("__cents") * 10000L - prior
    base
      .withColumn("n_taps", nTaps)
      .withColumn("ewma", microHalfUp(num * 10000L, den).cast("double") / lit(1000000.0))
      .withColumn("dev", devMicro.cast("double") / lit(1000000.0))
      .withColumn("alarm",
        coalesce((abs(devMicro) > thresholdMicro).cast("int"), lit(0)))
      .drop("__cents")
      .drop((1 to taps).map(k => s"__lag$k"): _*)
  }
}
