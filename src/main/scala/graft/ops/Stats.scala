package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution tests — the nonparametric readouts between
  * [[Experiment]] (means/rates) and [[Profile]] (drift gates): did the
  * metric DISTRIBUTION shift between two groups (treatment vs control,
  * this week vs last week, source A vs source B)?
  *
  * Both tests reduce the corpus to a per-distinct-value rollup first
  * (values are read at 2dp DECIMAL — the repo's metric contract — so
  * the rollup is bounded by the value vocabulary, ≤ 10⁴ per unit of
  * range), then every statistic is exact integer/rational arithmetic
  * over cumulative counts on that bounded frame:
  *
  *  - [[ksTest]]: D = max |F₁ − F₂|, computed as the exact integer
  *    max of |cum₁·n₂ − cum₂·n₁| cross-multiplied against the α-level
  *    critical value — no float boundary anywhere;
  *  - [[mannWhitney]]: U from tie-averaged ranks (exact rationals in
  *    half-units), z with the tie-corrected variance — fixed-order
  *    double chains over exact sums.
  */
object Stats {

  private def ranked(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val g = col(groupCol)
    val guarded = df.where(
      when(g.isNull || v.isNull,
        raise_error(lit(s"Stats: NULL in $groupCol/$valueCol — filter first")))
        .otherwise(lit(true)))
      .where(g === groupA || g === groupB)
    guarded
      .groupBy(v.as("__v"))
      .agg(
        sum(when(g === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(g === groupB, 1L).otherwise(0L)).as("__cb"))
  }

  /** Two-sample Kolmogorov–Smirnov: ONE row
    * `(n_a, n_b, d, d_crit, reject)` — `d` = max |F_a − F_b| (6dp of
    * the exact rational), `d_crit` = c(α)·√((n_a+n_b)/(n_a·n_b)) with
    * c = √(−ln(α/2)/2) (the standard asymptotic form), and `reject`
    * decided by the EXACT cross-multiply
    * `maxDiff² · n_a · n_b > c² · (n_a + n_b) · (n_a · n_b)²`
    * … equivalently maxDiff² > c²·(n_a+n_b)·n_a·n_b, kept in DECIMAL
    * integers against the 10⁻¹²-scaled c² so no float sits on the
    * decision boundary. */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      alpha: Double = 0.05
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val byV = Window.orderBy(col("__v").asc).rowsBetween(Long.MinValue, 0)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = ranked(df, groupCol, valueCol, groupA, groupB)
      .withColumn("__cuma", sum(col("__ca")).over(byV))
      .withColumn("__cumb", sum(col("__cb")).over(byV))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
      .withColumn("__diff",
        abs(col("__cuma").cast("decimal(38,0)") * col("__nb") -
          col("__cumb").cast("decimal(38,0)") * col("__na")))
    // c² in micro-units ×10¹²: exact integer comparison below
    val c2p12 = math.round(-math.log(alpha / 2.0) / 2.0 * 1e12)
    cum
      .groupBy("__na", "__nb")
      .agg(max(col("__diff")).as("__d"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("__d").cast("double") /
          (col("__na").cast("decimal(38,0)") * col("__nb")).cast("double"), 6).as("d"),
        round(
          sqrt(lit(-math.log(alpha / 2.0) / 2.0)) *
            sqrt((col("__na") + col("__nb")).cast("double") /
              (col("__na").cast("decimal(38,0)") * col("__nb")).cast("double")), 6)
          .as("d_crit"),
        // maxDiff² > c²·(n_a+n_b)·n_a·n_b — DECIMAL-exact both sides
        (col("__d") * col("__d") * lit(1000000000000L) >
          (col("__na") + col("__nb")).cast("decimal(38,0)") *
            (col("__na").cast("decimal(38,0)") * col("__nb")) * c2p12)
          .cast("int").as("reject"))
  }

  /** Two-sample Mann–Whitney U (normal approximation with tie
    * correction): ONE row
    * `(n_a, n_b, u_a, z, significant)` — tie-averaged ranks are exact
    * in HALF-units (2·rank is an integer: cum_before·2 + t + 1), so
    * `u_a` ships as an exact .0/.5 double; z uses the tie-corrected
    * variance `n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))` as a
    * fixed-order double chain over exact sums; `significant` at
    * |z| ≥ 1.96 like [[Experiment.abTest]]. */
  def mannWhitney(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    val byV = Window.orderBy(col("__v").asc).rowsBetween(Long.MinValue, -1)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = ranked(df, groupCol, valueCol, groupA, groupB)
      .withColumn("__t", col("__ca") + col("__cb"))
      .withColumn("__before", coalesce(sum(col("__t")).over(byV), lit(0L)))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
    // average rank of a tie group in HALF-units: 2·before + t + 1
    val rank2 = col("__before") * 2L + col("__t") + 1L
    val agg = cum
      .groupBy("__na", "__nb")
      .agg(
        // Σ ranks of group A, in half-units — exact integer
        sum(rank2.cast("decimal(38,0)") * col("__ca")).as("__r2a"),
        // tie correction Σ (t³ − t)
        sum(col("__t").cast("decimal(38,0)") * col("__t") * col("__t") - col("__t"))
          .as("__ties"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val nD = (col("__na") + col("__nb")).cast("double")
    // U_a = R_a − n_a(n_a+1)/2, from the half-unit rank sum
    val uA = (col("__r2a").cast("double") -
      (col("__na").cast("decimal(38,0)") * (col("__na") + 1L)).cast("double")) / lit(2.0)
    val mu = naD * nbD / lit(2.0)
    val varU = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - col("__ties").cast("double") / (nD * (nD - lit(1.0))))
    val z = when(varU > 0, round((uA - mu) / sqrt(varU), 6))
    agg.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      (uA + lit(0.0)).as("u_a"),
      z.as("z"),
      coalesce((abs(z) >= 1.96).cast("int"), lit(0)).as("significant"))
  }
}
