package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition mining over sessionized event
  * streams — the "what does a user do next" matrix behind next-event
  * prediction features, behavior-cloning corpora, and funnel design
  * (which step pairs actually occur vs the [[Funnel]] steps we
  * declared).
  *
  * Shape at scale: ONE exchange on the session key computes the
  * ordered `lead` pairs (the same user-partitioned window every
  * session op here rides), then the pair rollup is bounded by the
  * distinct state-pair count (event-type vocabularies are tiny), so
  * the second exchange moves |states|² rows, not the corpus. The
  * row-probability division is a single 6dp double division of exact
  * integer counts — no float accumulates across engines.
  */
object Markov {

  /** Transition counts + row-normalized probabilities between
    * consecutive events within a session. Sessions are maximal runs
    * where consecutive timestamps are < `gapUs` apart (the
    * [[graft.ts.Sessionize]] contract); transitions never cross a
    * session boundary.
    *
    * Output: (from_state, to_state, n, prob) with
    * prob = n / Σ n over from_state, rounded 6dp.
    */
  def transitions(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      stateCol: String,
      gapUs: Long
  ): DataFrame = {
    val byKey = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // session cut and the next-state lead ride the SAME key exchange:
    // a transition is valid when the next event is < gapUs ahead.
    val paired = events.select(
      col(stateCol).as("from_state"),
      lead(col(stateCol), 1).over(byKey).as("to_state"),
      (lead(col(tsCol), 1).over(byKey) - col(tsCol)).as("__dt"))
    val counts = paired
      .where(col("to_state").isNotNull && col("__dt") < gapUs)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_state")
    counts
      .withColumn("row_total", sum(col("n")).over(byFrom))
      .select(
        col("from_state"),
        col("to_state"),
        col("n"),
        round(col("n").cast("double") / col("row_total").cast("double"), 6).as("prob"))
  }
}
