package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment (A/B test) readout — the decision gate on a data or
  * model rollout: per-variant exposure/conversion counts and the
  * two-proportion pooled z statistic vs the control arm (the classic
  * normal-approximation test; |z| ≥ 1.96 ⇒ p < 0.05 two-sided).
  *
  * ONE map-side-combinable rollup keyed by variant; the control row's
  * counts are then spread across the (variant-count-sized) result with
  * a whole-frame window — NOT a singleton cross join, which Catalyst
  * plans as the banned BroadcastNestedLoopJoin. Scale shape: shuffled
  * rows bounded by the variant count at any corpus size.
  *
  * Determinism contract: rate and z are scalar double chains in a
  * fixed operation order (identical on any engine), rounded 6dp
  * half-even at the end — the repo's compared-doubles convention.
  */
object Experiment {

  /** Per variant: `n` exposures, `conv` conversions, `rate` (6dp),
    * and vs `controlVariant`: `z` (6dp pooled two-proportion z; NULL
    * for the control row itself and when either arm is empty or the
    * pooled variance is 0) and `significant` (0/1 at |z| ≥ 1.96).
    *
    * @param convCol 0/1 (or boolean) conversion indicator per row
    */
  def abTest(
      exposures: DataFrame,
      variantCol: String,
      convCol: String,
      controlVariant: String
  ): DataFrame = {
    val w = Window.partitionBy()
    val isCtl = col(variantCol) === controlVariant
    val byArm = exposures
      .groupBy(col(variantCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(convCol).cast("int") === 1, 1L).otherwise(0L)).as("conv"))
      .withColumn("__n_c", max(when(isCtl, col("n"))).over(w))
      .withColumn("__conv_c", max(when(isCtl, col("conv"))).over(w))
    val p1 = col("conv").cast("double") / col("n").cast("double")
    val p2 = col("__conv_c").cast("double") / col("__n_c").cast("double")
    val pPool = (col("conv") + col("__conv_c")).cast("double") /
      (col("n") + col("__n_c")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n").cast("double") + lit(1.0) / col("__n_c").cast("double")))
    val z = when(
      !isCtl && col("__n_c").isNotNull && col("n") > 0 && col("__n_c") > 0 && se > 0,
      round((p1 - p2) / se, 6))
    byArm
      .withColumn("rate", round(p1, 6))
      .withColumn("z", z)
      .withColumn("significant",
        coalesce((abs(col("z")) >= 1.96).cast("int"), lit(0)))
      .drop("__n_c", "__conv_c")
  }
}
