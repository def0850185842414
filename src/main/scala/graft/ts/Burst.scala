package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hysteresis burst/event detection over keyed ordered streams — the
  * sharp-wave-ripple / population-burst detector of the reference's
  * ecosystem (detect on a high threshold, extend to a low one, merge
  * events closer than a gap, drop events shorter than a minimum),
  * generalized to any keyed value stream (reference domain: the spike
  * detection pipeline jagular/spikes.py:142-237 uses the same
  * threshold-crossing machinery; the two-threshold extend-and-merge
  * form is the standard ripple recipe built on it).
  *
  * Thresholds are per-key `μ + k·σ`, with μ/σ from DECIMAL-exact
  * Σv / Σv² (population σ, the cancellation-safe
  * `max(0, (Σv² − (Σv)²/n)/n)` spelled identically in the oracle) —
  * both engines walk the identical doubles, so every comparison lands
  * the same way.
  *
  * Shape at scale: the stats and the position index ride ONE per-key
  * exchange; islands (maximal runs above the low threshold) collapse
  * by gaps-and-islands arithmetic into a frame bounded by the island
  * count, where the merge pass and the duration gate are windows over
  * that already-small frame.
  */
object Burst {

  /** Detect hysteresis events.
    *
    * @param kHi enter threshold multiplier (event must reach μ + kHi·σ)
    * @param kLo extend threshold multiplier (event spans the
    *            surrounding run above μ + kLo·σ)
    * @param mergeGapSamples events separated by LESS THAN this many
    *            below-threshold samples merge into one
    * @param minSamples events spanning fewer samples drop
    *
    * Output per event: key cols, `event_seq` (1-based per key, by
    * start), `start_us`/`stop_us` (first/last sample ts), `n_samples`
    * (span length in samples), `peak` (max value, double).
    */
  def detect(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String,
      kHi: Double,
      kLo: Double,
      mergeGapSamples: Long,
      minSamples: Long
  ): DataFrame = {
    require(kHi >= kLo, s"kHi ($kHi) must be >= kLo ($kLo)")
    val key = keyCols.map(col)
    val byKey = Window.partitionBy(key: _*).orderBy(col(tsCol).asc, col(tieCol).asc)
    val whole = Window.partitionBy(key: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val v2 = col(valueCol).cast("decimal(18,2)")
    // DECIMAL-exact moments -> identical doubles on every engine
    val stats = df.select(
      key ++ Seq(
        col(valueCol).cast("double").as("__v"),
        col(tsCol).as("__ts"),
        row_number().over(byKey).as("__rn"),
        sum(v2).over(whole).cast("double").as("__s1"),
        sum(v2 * v2).over(whole).cast("double").as("__s2"),
        count(lit(1)).over(whole).cast("double").as("__n")): _*)
    val mu = col("__s1") / col("__n")
    val varP = greatest(
      (col("__s2") - col("__s1") * col("__s1") / col("__n")) / col("__n"), lit(0.0))
    val sigma = sqrt(varP)
    val flagged = stats
      .withColumn("__lo", col("__v") > mu + lit(kLo) * sigma)
      .withColumn("__hi", col("__v") > mu + lit(kHi) * sigma)
      .where(col("__lo"))
    // gaps-and-islands: consecutive __rn within a key share one island
    val loRank = Window.partitionBy(key: _*).orderBy(col("__rn").asc)
    val islands = flagged
      .withColumn("__isl", col("__rn") - row_number().over(loRank))
      .groupBy(key :+ col("__isl"): _*)
      .agg(
        min(col("__rn")).as("__srn"), max(col("__rn")).as("__ern"),
        min(col("__ts")).as("__sts"), max(col("__ts")).as("__ets"),
        max(col("__hi").cast("int")).as("__has_hi"),
        max(col("__v").cast("decimal(18,2)")).as("__peak"))
      .where(col("__has_hi") === 1)
    // merge qualified islands separated by < mergeGapSamples
    val byStart = Window.partitionBy(key: _*).orderBy(col("__srn").asc)
    val merged = islands
      .withColumn("__newev",
        when(col("__srn") - lag(col("__ern"), 1).over(byStart) - 1 < mergeGapSamples
          && lag(col("__ern"), 1).over(byStart).isNotNull, 0).otherwise(1))
      .withColumn("__ev", sum(col("__newev")).over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(key :+ col("__ev"): _*)
      .agg(
        min(col("__sts")).as("start_us"), max(col("__ets")).as("stop_us"),
        (max(col("__ern")) - min(col("__srn")) + 1L).as("n_samples"),
        max(col("__peak")).cast("double").as("peak"),
        // rn-based start: the deterministic sequence key (duplicate
        // timestamps would make start_us ties order-ambiguous)
        min(col("__srn")).as("__esrn"))
      .where(col("n_samples") >= minSamples)
    val seq = Window.partitionBy(key: _*).orderBy(col("__esrn").asc)
    merged.select(
      key ++ Seq(
        row_number().over(seq).as("event_seq"),
        col("start_us"), col("stop_us"), col("n_samples"), col("peak")): _*)
  }
}
