package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-parity audit over a boolean outcome — the fairness readout a
  * curation pipeline runs before shipping a filtered corpus: does the
  * quality gate (or classifier, or sampler) pass documents from every
  * language/source/domain at comparable rates, or is it silently
  * starving a slice?
  *
  * Reports, per group: n, positives, selection rate, the gap vs the
  * overall rate, and the disparate-impact ratio (group rate / overall
  * rate — the EEOC "four-fifths rule" statistic). All inputs are exact
  * integer counts; each shipped ratio is ONE 6dp double division, so
  * engines cannot drift.
  *
  * Shape at scale: one map-side-combinable (group) rollup; the overall
  * totals ride the bounded group frame as an unpartitioned window (the
  * frame is |groups| rows — languages/sources, not the corpus).
  */
object Fairness {

  /** Per-group parity report for a 0/1 `flagCol`. NULL groups or flags
    * fail loud — silently dropping them would misreport every rate. */
  def parityReport(df: DataFrame, groupCol: String, flagCol: String): DataFrame = {
    val guarded = df.where(
      when(col(groupCol).isNull || col(flagCol).isNull,
        raise_error(lit(s"Fairness: NULL in $groupCol/$flagCol — filter or impute first")))
        .otherwise(lit(true)))
    val grouped = guarded
      .groupBy(col(groupCol).as("group"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(flagCol).cast("long")).as("n_pos"))
    // overall totals as an unpartitioned window over the bounded group
    // frame — no second corpus scan, no singleton cross join
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    grouped
      .withColumn("__tn", sum(col("n")).over(all))
      .withColumn("__tp", sum(col("n_pos")).over(all))
      .select(
        col("group"),
        col("n"),
        col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6).as("rate"),
        round(
          col("n_pos").cast("double") / col("n").cast("double") -
            col("__tp").cast("double") / col("__tn").cast("double"), 6).as("gap"),
        // DI ratio vs the overall rate; NULL when nothing passes at all
        when(col("__tp") > 0,
          round((col("n_pos").cast("double") / col("n").cast("double")) /
            (col("__tp").cast("double") / col("__tn").cast("double")), 6))
          .as("di_ratio"))
  }
}
