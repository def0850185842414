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

  /** CUPED variance reduction (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments"): adjust the
    * experiment metric by a pre-experiment covariate,
    * `y' = y − θ·(x − x̄)` with `θ = Cov(x, y) / Var(x)` estimated
    * POOLED over all arms (the standard form — θ from pooled data
    * keeps the adjustment unbiased across arms).
    *
    * Per variant: n, `mean_y`, `mean_adj` (both 6dp), plus the shared
    * `theta` and `rho2` (the squared x–y correlation = the fraction of
    * metric variance CUPED removes) on every row.
    *
    * Exactness: ONE per-arm rollup of DECIMAL-exact Σx, Σy, Σxy, Σx²,
    * Σy² (inputs read at 2dp; products exact 4dp); the pooled moments
    * are whole-frame window sums over the bounded arm frame, and every
    * shipped double is a fixed-order scalar chain over those exact
    * sums — engines cannot drift. Shuffled rows are bounded by the
    * variant count at any corpus size. */
  def cuped(
      exposures: DataFrame,
      variantCol: String,
      metricCol: String,
      covariateCol: String
  ): DataFrame = {
    val y = col(metricCol).cast("decimal(18,2)")
    val x = col(covariateCol).cast("decimal(18,2)")
    val w = Window.partitionBy()
    val byArm = exposures
      .groupBy(col(variantCol))
      .agg(
        count(lit(1)).as("n"),
        sum(y).as("__sy"), sum(x).as("__sx"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    // pooled names must not case-insensitively collide with the arm
    // sums (withColumn("__SY") would silently REPLACE "__sy")
    val pooled = byArm
      .withColumn("__tn", sum(col("n")).over(w))
      .withColumn("__ty", sum(col("__sy")).over(w))
      .withColumn("__tx", sum(col("__sx")).over(w))
      .withColumn("__txy", sum(col("__sxy")).over(w))
      .withColumn("__txx", sum(col("__sxx")).over(w))
      .withColumn("__tyy", sum(col("__syy")).over(w))
    def d(c: String) = col(c).cast("double")
    val nD = d("__tn")
    val covXY = d("__txy") - d("__tx") * d("__ty") / nD
    val varX = d("__txx") - d("__tx") * d("__tx") / nD
    val varY = d("__tyy") - d("__ty") * d("__ty") / nD
    val theta = when(varX > 0, covXY / varX)
    val meanY = d("__sy") / col("n").cast("double")
    val meanXGap = d("__sx") / col("n").cast("double") - d("__tx") / nD
    pooled.select(
      col(variantCol), col("n"),
      round(meanY, 6).as("mean_y"),
      round(when(theta.isNotNull, meanY - theta * meanXGap).otherwise(meanY), 6)
        .as("mean_adj"),
      round(theta, 6).as("theta"),
      round(when(varX > 0 && varY > 0, covXY * covXY / (varX * varY)), 6).as("rho2"))
  }

  /** Wald's sequential probability ratio test per arm — the
    * ALWAYS-VALID alternative to [[abTest]]'s fixed-horizon z: decide
    * H1 (rate = p1) vs H0 (rate = p0) the moment the evidence crosses
    * a boundary, with α/β guarantees that hold under continuous
    * monitoring (no peeking penalty).
    *
    * The log-likelihood ratio for Bernoulli data is LINEAR in the
    * counts — llr = conv·ln(p1/p0) + (n − conv)·ln((1−p1)/(1−p0)) —
    * so the whole chain is EXACT integer arithmetic once the two log
    * terms and the two Wald boundaries ln((1−β)/α), ln(β/(1−α)) are
    * pinned as 10⁻⁶-scaled literals (they are driver-side constants
    * of the design, like the χ² critical value): llrMicro =
    * conv·L1 + (n − conv)·L0, decision by integer compare. No float
    * ever sits on the decision boundary, and the statistic is
    * map-side-combinable (ONE arm rollup).
    *
    * Per arm: `(variant, n, conv, llr, decision)` with decision ∈
    * `accept_h1` (llr ≥ upper), `accept_h0` (llr ≤ lower),
    * `continue`.
    */
  def sprt(
      df: DataFrame,
      variantCol: String,
      convCol: String,
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.2
  ): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct rates in (0,1), got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta must be in (0,1), got $alpha/$beta")
    val l1 = math.round(math.log(p1 / p0) * 1e6)
    val l0 = math.round(math.log((1 - p1) / (1 - p0)) * 1e6)
    val upper = math.round(math.log((1 - beta) / alpha) * 1e6)
    val lower = math.round(math.log(beta / (1 - alpha)) * 1e6)
    df.where(
      when(col(variantCol).isNull || col(convCol).isNull,
        raise_error(lit(s"sprt: NULL in $variantCol/$convCol — filter first")))
        .otherwise(lit(true)))
      .groupBy(col(variantCol).as("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(convCol).cast("long")).as("conv"))
      .withColumn("__llr", col("conv") * l1 + (col("n") - col("conv")) * l0)
      .select(
        col("variant"), col("n"), col("conv"),
        (col("__llr").cast("double") / lit(1000000.0)).as("llr"),
        when(col("__llr") >= upper, lit("accept_h1"))
          .when(col("__llr") <= lower, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }
}
