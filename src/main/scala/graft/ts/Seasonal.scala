package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal-profile anomaly detection — the SEASONAL complement to
  * [[Ewma]]'s trend monitor: score each sample against the corpus's
  * own profile for that phase of the cycle (hour-of-day, day-of-week,
  * position-in-session), so "Monday 9am is always high" stops being
  * an anomaly and "high at 3am" starts being one.
  *
  * Phase = (ts div `binUs`) mod `phases` — pure integer arithmetic on
  * epoch micros (a day cycle at hour bins is binUs = 3600·10⁶,
  * phases = 24). Per (key, phase): count and the INTEGER-EXACT 6dp
  * mean of the 2dp-cent values (the sign-aware half-up integral
  * division every profile op here uses — a float mean would split
  * engines by one ulp at scale). Each row then gets
  * `expected` (its phase mean), `residual` (micro-exact
  * value − expected), and the alarm |residual| > thresholdMicro as an
  * integer compare — no float on the alert boundary.
  *
  * Plan: ONE map-side-combinable (key, phase) rollup (bounded by
  * keys × phases) broadcast back onto the stream — at scale the
  * profile side is tiny, so the join is a broadcast hash join and the
  * event stream never shuffles; with huge key counts it degrades to a
  * shuffled equi-join on (key, phase), never a nested loop. Phases a
  * key never visited simply don't join (inner) — every scored row has
  * a profile by construction (its own phase exists).
  */
object Seasonal {

  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  private def microHalfUp(num: Column, den: Column): Column =
    when(num >= 0, intDiv(num * 2 + den, den * 2))
      .otherwise(-intDiv((-num) * 2 + den, den * 2))

  private def phaseCol(tsCol: String, binUs: Long, phases: Int): Column =
    pmod(intDiv(col(tsCol), lit(binUs)), lit(phases.toLong))

  private def centsCol(valCol: String): Column =
    (col(valCol).cast("decimal(18,2)") * 100).cast("long")

  /** The trained per-(key, phase) profile:
    * `(keys…, phase, n_phase, mean_micro)` — `mean_micro` the
    * integer-exact 6dp-scaled phase mean. This is the artifact a
    * deployment trains in batch and serves live
    * ([[graft.streaming.Streaming.seasonalScoreStream]] joins it
    * stream-static). */
  def profile(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      binUs: Long,
      phases: Int
  ): DataFrame = {
    require(keyCols.nonEmpty, "profile needs at least one key column")
    require(binUs >= 1, s"binUs must be >= 1, got $binUs")
    require(phases >= 2 && phases <= 10000, s"phases must be in [2,10000], got $phases")
    df.where(col(valCol).isNotNull)
      .withColumn("__cents", centsCol(valCol))
      .withColumn("phase", phaseCol(tsCol, binUs, phases))
      .groupBy((keyCols.map(col) :+ col("phase")): _*)
      .agg(
        count(lit(1)).as("n_phase"),
        // phase mean in micro units: exact half-up of Σcents·10⁴ / n
        microHalfUp(sum(col("__cents")) * 10000L, count(lit(1))).as("mean_micro"))
  }

  /** Score `df` against an already-trained [[profile]] frame: each row
    * gets `(phase, n_phase, expected, residual, alarm)` — micro-exact
    * residual vs the profile's phase mean, integer-compare alarm.
    * Rows whose (key, phase) has no profile row drop (inner join —
    * an unprofiled phase has no expectation to score against). */
  def score(
      df: DataFrame,
      prof: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      binUs: Long,
      phases: Int,
      thresholdMicro: Long
  ): DataFrame = {
    require(thresholdMicro >= 0, s"thresholdMicro must be >= 0, got $thresholdMicro")
    df.where(col(valCol).isNotNull)
      .withColumn("__cents", centsCol(valCol))
      .withColumn("phase", phaseCol(tsCol, binUs, phases))
      .join(prof, keyCols :+ "phase")
      .withColumn("__res_micro", col("__cents") * 10000L - col("mean_micro"))
      .withColumn("expected", col("mean_micro").cast("double") / lit(1000000.0))
      .withColumn("residual", col("__res_micro").cast("double") / lit(1000000.0))
      .withColumn("alarm", (abs(col("__res_micro")) > thresholdMicro).cast("int"))
      .drop("__cents", "mean_micro", "__res_micro")
  }

  /** See object doc. Output: the input's key/ts/id columns plus
    * `(phase, n_phase, expected, residual, alarm)`. NULL values are
    * excluded up front (nothing to score). Self-profile form:
    * [[profile]] trained on the input itself, then [[score]]d. */
  def residuals(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      binUs: Long,
      phases: Int,
      thresholdMicro: Long
  ): DataFrame =
    score(df, profile(df, keyCols, tsCol, valCol, binUs, phases),
      keyCols, tsCol, valCol, binUs, phases, thresholdMicro)
}
