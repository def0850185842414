package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operating-point selection for a scored gate — "what score cutoff
  * makes this quality/toxicity/dedup classifier precise enough to
  * trust": among all thresholds whose kept set (`score >= t`) reaches
  * the target precision, pick the one keeping the MOST data (highest
  * recall). The tuning loop behind every [[graft.ops.Curation]]-style
  * score gate.
  *
  * Exactness: scores are read at 4dp DECIMAL (the [[Calibration]]
  * contract) and candidate thresholds are the distinct observed
  * scores, so the rollup is bounded by the score GRANULARITY (≤ 10^4
  * + 1 rows for [0,1] at 4dp) — never the corpus. The precision test
  * is cross-multiplied integers (`cum_pos · 10^6 ≥ target_micro ·
  * cum_n`) — no float boundary decides membership; the reported
  * precision/recall are one 6dp division each at the end.
  *
  * Execution shape: one map-side-combinable per-score rollup, then a
  * cumulative window over the bounded distinct-score frame (single
  * partition BY DESIGN — ≤ 10k rows at any corpus size), then a
  * 1-row min. */
object Thresholds {

  /** @param targetPrecisionMicro target precision in millionths
    *        (950000 = 0.95) — integers end to end
    * @return ONE row (threshold double, n_kept, n_pos_kept,
    *         precision 6dp, recall 6dp), or zero rows if no threshold
    *         reaches the target */
  def precisionThreshold(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      targetPrecisionMicro: Long
  ): DataFrame = {
    require(targetPrecisionMicro >= 0 && targetPrecisionMicro <= 1000000L,
      s"targetPrecisionMicro must be in [0, 1e6], got $targetPrecisionMicro")
    val s = col(scoreCol).cast("decimal(9,4)")
    val perScore = scored
      .where(s.isNotNull)
      .groupBy(s.as("__s"))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col(labelCol).cast("int") === 1, 1L).otherwise(0L)).as("__p"))
    val cum = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    perScore
      .withColumn("__cn", sum(col("__n")).over(cum))
      .withColumn("__cp", sum(col("__p")).over(cum))
      .withColumn("__tp", sum(col("__p")).over(all))
      .where(col("__cp") * 1000000L >= lit(targetPrecisionMicro) * col("__cn"))
      .orderBy(col("__s").asc)
      .limit(1)
      .select(
        col("__s").cast("double").as("threshold"),
        col("__cn").as("n_kept"),
        col("__cp").as("n_pos_kept"),
        round(col("__cp").cast("double") / col("__cn").cast("double"), 6).as("precision"),
        when(col("__tp") > 0,
          round(col("__cp").cast("double") / col("__tp").cast("double"), 6))
          .as("recall"))
  }
}
