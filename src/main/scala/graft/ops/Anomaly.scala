package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-based anomaly flagging over an event/metric stream —
  * the telemetry guardrail of an ingestion pipeline (a crawler shard
  * emitting pathological doc sizes, a scorer drifting, a source whose
  * value distribution jumps). Per-group mean/σ come from ONE
  * map-side-combinable aggregate whose sums go through DECIMAL (exact,
  * order-independent ⇒ oracle-identical doubles); the tiny per-group
  * stats table is count-gate-broadcast back, so the stream itself never
  * shuffles — the same two-pass broadcast shape as the LM scoring
  * joins.
  *
  * Population variance, one fixed spelling mirrored by the oracle:
  * mean = Σv/n, var = Σv²/n − mean² (clamped at 0 for the all-equal
  * group), flag when |v − mean| > k·σ with σ > 0.
  */
object Anomaly {

  def zscoreFlags(
      events: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 3.0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dec = col(valueCol).cast("decimal(18,2)")
    // n counts the VALUES THAT ENTERED THE SUMS (the decimal cast nulls
    // |v| ≥ ~10¹⁶ under non-ANSI semantics): counting raw rows would put
    // dropped values in the denominator but not the numerator, silently
    // skewing mean/σ. Dropped rows still flow through the compare below
    // — a 10¹⁷ outlier is flagged against the clean stats.
    val stats = events
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(dec).as("__n"),
        sum(dec).cast("double").as("__sum"),
        sum(dec * dec).cast("double").as("__sumsq"))
      .where(col("__n") > 0L)
      .withColumn("__mean", col("__sum") / col("__n"))
      .withColumn("__var", greatest(col("__sumsq") / col("__n") - col("__mean") * col("__mean"), lit(0.0)))
      .withColumn("__std", sqrt(col("__var")))
      .select(groupCols.map(col) :+ col("__mean") :+ col("__std"): _*)
    // collect ONCE to a local relation (groups are bounded — event types,
    // sources; capped against pathological group columns): a
    // count-then-join spelling executes the stats aggregate twice — the
    // repeated-subtree rule. Shared recipe: [[graft.util.DriverSide]].
    val statsSide = graft.util.DriverSide.smallSideOrTracked(stats)
    events
      .join(statsSide, groupCols)
      .where(col("__std") > 0.0 &&
        abs(col(valueCol) - col("__mean")) > lit(k) * col("__std"))
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__std"), 4))
      .withColumn("group_mean", round(col("__mean"), 4))
      .drop("__mean", "__std")
  }

  /** Two-sided CUSUM drift detection (Page 1954) — the SEQUENTIAL
    * complement of [[zscoreFlags]]: a point outlier trips the z-score,
    * but a small persistent shift (a scorer drifting 10% for an hour, a
    * crawler shard's doc sizes creeping) never does; the cumulative-sum
    * statistic accumulates every excursion past `slack` and fires when
    * the running total clears `h`.
    *
    * The textbook recurrence is loop-carried
    * (`S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (vᵢ − target − slack))`) — not a fixed-frame
    * window. The closed form IS: with prefix sums
    * `Pᵢ = Σⱼ≤ᵢ (vⱼ − target − slack)` and `P₀ = 0`,
    * `S⁺ᵢ = Pᵢ − min₀≤ⱼ≤ᵢ Pⱼ` — a running sum and a running min, two
    * chained codegen'd window passes over ONE key exchange and ONE
    * sort (the downward side rides the same windows on its own
    * series). No mapPartitions, no state store.
    *
    * All arithmetic is DECIMAL(18,2)-exact (the [[zscoreFlags]] /
    * q_running_sum contract), so results are order-stable and
    * engine-identical; `target`/`slack`/`h` are exact decimal
    * constants — the SPC formulation with a KNOWN target (callers
    * estimating the target from the stream compute it with
    * [[zscoreFlags]]' stats pass first). Emits the rows where either
    * side exceeds `h`: (keyCols, orderCols, value, cusum_up,
    * cusum_down). Ordering must be made unique by `orderCols` (ties
    * would make the prefix sum nondeterministic). */
  def cusumFlags(
      events: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      target: java.math.BigDecimal,
      slack: java.math.BigDecimal,
      h: java.math.BigDecimal
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    require(slack.signum >= 0, s"slack must be >= 0, got $slack")
    require(h.signum > 0, s"h must be positive, got $h")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast("decimal(18,2)")
    val zero = lit(java.math.BigDecimal.ZERO.setScale(2))
    val prefixed = events.select(
      col("*"),
      sum(v - lit(target) - lit(slack)).over(w).as("__pu"),
      sum(lit(target) - v - lit(slack)).over(w).as("__pd"))
    // least(0, min) realizes the virtual P₀ = 0 start of the recurrence
    val cusum = prefixed.select(
      col("*"),
      (col("__pu") - least(zero, min(col("__pu")).over(w))).as("__su"),
      (col("__pd") - least(zero, min(col("__pd")).over(w))).as("__sd"))
    // round(2) after the double cast: the values are exact at 2dp but
    // engines disagree by 1 ulp on the decimal→double conversion itself
    cusum
      .where(col("__su") > lit(h) || col("__sd") > lit(h))
      .select((keyCols ++ orderCols).map(col) ++ Seq(
        round(v.cast("double"), 2).as("value"),
        round(col("__su").cast("double"), 2).as("cusum_up"),
        round(col("__sd").cast("double"), 2).as("cusum_down")): _*)
  }

}
