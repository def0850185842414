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
    val stats = events
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(dec).cast("double").as("__sum"),
        sum(dec * dec).cast("double").as("__sumsq"))
      .withColumn("__mean", col("__sum") / col("__n"))
      .withColumn("__var", greatest(col("__sumsq") / col("__n") - col("__mean") * col("__mean"), lit(0.0)))
      .withColumn("__std", sqrt(col("__var")))
      .select(groupCols.map(col) :+ col("__mean") :+ col("__std"): _*)
    val nGroups = stats.count()
    events
      .join(graft.spikes.Spikes.broadcastIfSmall(stats, nGroups), groupCols)
      .where(col("__std") > 0.0 &&
        abs(col(valueCol) - col("__mean")) > lit(k) * col("__std"))
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__std"), 4))
      .withColumn("group_mean", round(col("__mean"), 4))
      .drop("__mean", "__std")
  }
}
