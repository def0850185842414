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

}
