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

  /** `a div b` at the Column level (the [[SkewJoin]] spelling):
    * IntegralDivide accepts decimal operands and returns LONG. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Sign-aware half-up `num/den` in micro units (den > 0), the
    * [[graft.ops.Labels]] ratio6 recipe: both engines replay the
    * identical integral division, so no float sits on a boundary. */
  private def microHalfUp(num: Column, den: Column): Column =
    when(num >= 0, intDiv(num * 2 + den, den * 2))
      .otherwise(-intDiv((-num) * 2 + den, den * 2))

  /** Pearson chi-square test of independence between two CATEGORICAL
    * columns — the third leg of the test battery ([[ksTest]] for
    * numeric shift, [[mannWhitney]] for numeric location, this for
    * categorical association: did label mix shift by source, does
    * event type depend on user band?).
    *
    * ONE corpus-sized (a, b) rollup bounds everything after it by the
    * contingency-table size R×C (the caller's contract: both columns
    * are low-cardinality categories — bands, types, labels; NOT free
    * text). Marginals ride the bounded cells frame as window sums —
    * no join of any kind (a marginal×marginal cross join would plan
    * the banned nested-loop join). Zero-observed cells still
    * contribute: each contributes exactly its expected count e
    * ((0−e)²/e = e), so their TOTAL mass has the closed form
    * (N² − Σ_observed ra·cb)/N (since Σ_grid ra·cb = N²) — the
    * classic sparse-rollup understatement bug, designed out without
    * densifying.
    *
    * Per observed cell, the χ² term (o − e)²/e with e = ra·cb/N is
    * kept as the EXACT rational (o·N − ra·cb)² / (ra·cb·N) and
    * shipped as its 6dp half-up micro integer; the statistic is the
    * exact integer SUM of those micro terms plus the zero-cell
    * collective term's half-up micro (so both engines agree
    * bit-for-bit), and the reject decision is an integer compare
    * against `critMicro` — the caller's 10⁻⁶-scaled critical value
    * for the table's dof (no closed form exists for the χ² inverse
    * CDF; the caller pins it, e.g. 21026000 for dof 12 at α = 0.05).
    * `valid` flags Cochran's rule (all expected counts ≥ 5) via the
    * cross-multiply min(ra)·min(cb) ≥ 5·N — the grid minimum is the
    * product of the marginal minima.
    *
    * MAGNITUDE CONTRACT (the [[Eval.clusteringAgreement]] /
    * `linearFit` convention): the per-cell exact numerator d²·10⁶ with
    * |d| ≤ N² needs N⁴·10⁶ < 10³⁸, so the exact chain holds for
    * N ≲ 10⁸ rows. Past that a cell's DECIMAL(38,0) term overflows —
    * guarded by a raise_error so the operator fails LOUD instead of
    * silently dropping the overflowed cell from the statistic.
    * Above the bound, pre-aggregate to a sample or pass pre-counted
    * cells through a scaled-down replica.
    *
    * Returns ONE row:
    * `(n, n_rows, n_cols, dof, chi2, reject, min_expected, valid)`.
    */
  def chiSquared(
      df: DataFrame,
      colA: String,
      colB: String,
      critMicro: Long
  ): DataFrame = {
    require(critMicro >= 0, s"critMicro must be >= 0, got $critMicro")
    val a = col(colA)
    val b = col(colB)
    val guarded = df.where(
      when(a.isNull || b.isNull,
        raise_error(lit(s"chiSquared: NULL in $colA/$colB — filter first")))
        .otherwise(lit(true)))
    val cells = guarded.groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1)).as("__o"))
    val byA = Window.partitionBy("__a").rowsBetween(Long.MinValue, Long.MaxValue)
    val byB = Window.partitionBy("__b").rowsBetween(Long.MinValue, Long.MaxValue)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val grid = cells
      .withColumn("__ra", sum(col("__o")).over(byA))
      .withColumn("__cb", sum(col("__o")).over(byB))
      .withColumn("__n", sum(col("__o")).over(whole))
    val e38 = (col("__ra").cast("decimal(38,0)") * col("__cb"))
    val d = col("__o").cast("decimal(38,0)") * col("__n") - e38
    // a DECIMAL(38,0) overflow NULLs the cell term and `sum` would then
    // silently DROP it from the statistic — fail loud instead (the
    // N ≲ 1e8 magnitude contract in the scaladoc)
    val contribRaw = microHalfUp(d * d * lit(1000000L), e38 * col("__n"))
    val contribMicro = when(contribRaw.isNull,
      raise_error(lit("chiSquared: exact chain overflows DECIMAL(38,0) — " +
        "N exceeds the ~1e8-row magnitude contract; pre-aggregate or sample")))
      .otherwise(contribRaw)
    val n38 = col("__n").cast("decimal(38,0)")
    grid
      .withColumn("__contrib", contribMicro)
      .groupBy("__n")
      .agg(
        count_distinct(col("__a")).as("__r"),
        count_distinct(col("__b")).as("__c"),
        sum(col("__contrib")).as("__om"),
        sum(e38).as("__emass"),
        min(col("__ra")).as("__minra"),
        min(col("__cb")).as("__mincb"))
      // observed terms + the zero-cell collective term (N² − Σobs ra·cb)/N
      .withColumn("__chi2m",
        col("__om") + microHalfUp(
          (n38 * col("__n") - col("__emass")) * lit(1000000L), n38))
      .withColumn("__mine",
        col("__minra").cast("decimal(38,0)") * col("__mincb"))
      .select(
        col("__n").as("n"),
        col("__r").as("n_rows"),
        col("__c").as("n_cols"),
        ((col("__r") - 1L) * (col("__c") - 1L)).as("dof"),
        (col("__chi2m").cast("double") / lit(1000000.0)).as("chi2"),
        (col("__chi2m") > critMicro).cast("int").as("reject"),
        (microHalfUp(col("__mine") * lit(1000000L), n38)
          .cast("double") / lit(1000000.0)).as("min_expected"),
        (col("__mine") >= n38 * 5L).cast("int").as("valid"))
  }

  /** Benford's-law micro proportions log10(1 + 1/d), d = 1…9, pinned
    * as 10⁻⁶-scaled integer LITERALS (the transcendental constants
    * never touch either engine's libm). */
  private[graft] val benfordMicro: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford first-significant-digit audit of a positive metric column
    * — the data-quality / fraud screen for "organic" magnitudes
    * (prices, populations, file sizes): fabricated or truncated data
    * departs from the log-uniform digit law.
    *
    * Values are read at the repo's 2dp DECIMAL metric contract; the
    * first significant digit comes from the STRING form of the
    * positive cent integer (exact on both engines — no log10 float).
    * One corpus-sized digit rollup (9 groups, map-side combinable)
    * bounds everything; the digit frame is densified from a literal
    * 1…9 sequence so a missing digit still contributes its full
    * expected mass. Per digit: observed `n`, observed `share` (6dp
    * half-up), `expected_share` (the pinned literal), expected count
    * `expected` (the exact integer p·N read as a double), and the χ²
    * term `contrib` = (o·10⁶ − p·N)²/(p·N·10⁶) as its 6dp half-up —
    * with `chi2` (the exact micro SUM over all 9 digits, dof = 8)
    * repeated on every row for a one-scan readout. Zero and NULL
    * values are excluded (no first digit); strictly negative input
    * audits its magnitude.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = abs(col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    // digit stays the STRING form. r19 tried a magnitude when-chain of
    // IntegralDivides (probe said digit stage 0.60 → 0.48 s with
    // double-division arithmetic) — but the exact-division spelling
    // regressed the FULL query 1.29 → 3.6 s (isolated, reproduced):
    // an 18-branch CaseWhen of IntegralDivides inside the aggregate
    // key degrades the whole stage (double division is not usable —
    // longs past 2^53 lose the digit). Tried and rejected; substring
    // is the floor here.
    val counts = df
      .select(cents.as("__c"))
      .where(col("__c").isNotNull && col("__c") > 0L)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
    val digits = counts.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val pMicro = element_at(
      array(benfordMicro.map(lit): _*), col("digit"))
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val dense = digits
      .join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__total", sum(col("n")).over(whole))
    val pn = pMicro.cast("decimal(38,0)") * col("__total")
    val d = col("n").cast("decimal(38,0)") * lit(1000000L) - pn
    // χ² term (o−e)²/e = d²/(10⁶·pn) in natural units → d²/pn in micro
    val contribMicro = microHalfUp(d * d, pn)
    dense
      .withColumn("__contrib", contribMicro)
      .withColumn("__chi2m", sum(col("__contrib")).over(whole))
      .select(
        col("digit"),
        col("n"),
        (microHalfUp(col("n").cast("decimal(38,0)") * lit(1000000L),
          col("__total").cast("decimal(38,0)")).cast("double") / lit(1000000.0))
          .as("share"),
        (pMicro.cast("double") / lit(1000000.0)).as("expected_share"),
        (pn.cast("double") / lit(1000000.0)).as("expected"),
        (col("__contrib").cast("double") / lit(1000000.0)).as("contrib"),
        (col("__chi2m").cast("double") / lit(1000000.0)).as("chi2"))
  }

  /** Population stability index between a BASELINE and a CURRENT
    * sample of a metric — the standard production drift gate
    * (alert at PSI > 0.2): how far has the current distribution
    * moved across the baseline's own deciles?
    *
    * Bins are the baseline's equal-frequency quantile bins, derived
    * in EXACT integers on the bounded per-distinct-2dp-value rollup
    * (the [[ksTest]] frame): a value whose inclusive baseline
    * cumulative count is cumA lands in bin
    * clamp(⌊(cumA−1)·nBins/nA⌋, 0, nBins−1) — ties share a bin, so
    * binning is engine-replayable with no float boundary. Per-bin
    * probabilities are clamped at 10⁻⁶ (the standard zero-count
    * smoothing) and each term (pa−pb)·ln(pa/pb) follows the
    * [[graft.ops.Text.tokenDrift]] determinism recipe: per-term
    * 12dp round into DECIMAL(38,12), ORDER-INDEPENDENT exact decimal
    * sum, one 6dp round at the end; the alert compares the exact
    * decimal sum against the 0.2 literal (no float on the alarm
    * boundary). Bins emptied by heavy ties are omitted — their
    * clamped term is exactly 0.
    *
    * Per populated bin: `(bin, na, nb, pa, pb, term)` with the corpus
    * `psi` and `alert` repeated on every row for a one-scan readout.
    */
  def psi(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      nBins: Int = 10
  ): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be in [2,1000], got $nBins")
    val byV = Window.orderBy(col("__v").asc).rowsBetween(Long.MinValue, 0)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = ranked(df, groupCol, valueCol, groupA, groupB)
      .withColumn("__cuma", sum(col("__ca")).over(byV))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
    val binRaw = intDiv((col("__cuma") - 1L) * nBins, col("__na"))
    val bin = greatest(lit(0L), least(lit(nBins - 1L), binRaw))
    val bins = cum
      .groupBy(bin.as("bin"), col("__na"), col("__nb"))
      .agg(sum(col("__ca")).as("na"), sum(col("__cb")).as("nb"))
    val pa = col("na").cast("double") / col("__na").cast("double")
    val pb = col("nb").cast("double") / col("__nb").cast("double")
    val paC = greatest(pa, lit(1e-6))
    val pbC = greatest(pb, lit(1e-6))
    val term = (paC - pbC) * log(paC / pbC)
    bins
      .withColumn("__t", round(term, 12).cast("decimal(38,12)"))
      .withColumn("__psid", sum(col("__t")).over(whole))
      .select(
        col("bin"),
        col("na"),
        col("nb"),
        round(pa, 6).as("pa"),
        round(pb, 6).as("pb"),
        round(col("__t").cast("double"), 6).as("term"),
        round(col("__psid").cast("double"), 6).as("psi"),
        (col("__psid") > lit(new java.math.BigDecimal("0.200000000000")))
          .cast("int").as("alert"))
  }

  /** Per-group EXACT quantile report — the latency-dashboard shape
    * (P50/P90/P99 of a metric per service/type/segment), computed as
    * true type-1 quantiles, not sketch estimates: the corpus reduces
    * to ONE per-(group, distinct 2dp value) rollup (bounded by
    * groups × value vocabulary), and each quantile is the smallest
    * value whose cumulative count reaches ⌈p·n⌉ — selected by the
    * integer cross-multiply cum·den ≥ num·n (probabilities enter as
    * exact rationals `(name, num, den)`; no float boundary).
    *
    * One row per group: `(key, n, <name…>)` with each quantile the
    * exact 2dp value as a double.
    */
  def groupQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      probs: Seq[(String, Long, Long)] =
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
  ): DataFrame = {
    require(probs.nonEmpty, "groupQuantiles needs at least one probability")
    probs.foreach { case (nm, num, den) =>
      require(num >= 1 && num <= den, s"prob $nm must be a rational in (0,1]: $num/$den")
    }
    val k = col(keyCol)
    val v = col(valueCol).cast("decimal(18,2)")
    val guarded = df.where(
      when(k.isNull || v.isNull,
        raise_error(lit(s"groupQuantiles: NULL in $keyCol/$valueCol — filter first")))
        .otherwise(lit(true)))
    val byV = Window.partitionBy("__k").orderBy(col("__v").asc)
      .rowsBetween(Long.MinValue, 0)
    val whole = Window.partitionBy("__k").rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = guarded
      .groupBy(k.as("__k"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__n", sum(col("__c")).over(whole))
    val picks = probs.map { case (nm, num, den) =>
      min(when(col("__cum") * den >= col("__n") * num, col("__v"))).cast("double").as(nm)
    }
    cum
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__n")).as("n"), picks: _*)
  }

  /** Per-group Shannon entropy of a categorical column — the
    * diversity readout (label mix per source, event mix per user;
    * near-zero entropy flags a degenerate/templated group, entropy
    * near ln(k) a uniform one).
    *
    * ONE (keys, value) rollup bounds everything by group × vocabulary;
    * marginals ride it as keyed windows. Each term −(c/n)·ln(c/n)
    * follows the [[graft.ops.Text.tokenDrift]] determinism recipe
    * (12dp round → DECIMAL(38,12) order-independent exact sum, one
    * 6dp round at the end); `norm_entropy` = entropy/ln(k) with ln of
    * an exact integer (NULL for single-value groups — nothing to
    * normalize by). Entropy is in nats.
    *
    * Returns per key: `(keys…, n, n_distinct, entropy, norm_entropy)`.
    */
  def entropy(
      df: DataFrame,
      keyCols: Seq[String],
      valCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "entropy needs at least one key column")
    val guarded = df.where(
      when(col(valCol).isNull,
        raise_error(lit(s"entropy: NULL in $valCol — filter or bucket first")))
        .otherwise(lit(true)))
    val cells = guarded
      .groupBy((keyCols.map(col) :+ col(valCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val byK = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val p = col("__c").cast("double") / col("__n").cast("double")
    val termD = round(-p * log(p), 12).cast("decimal(38,12)")
    cells
      .withColumn("__n", sum(col("__c")).over(byK))
      .withColumn("__k", count(lit(1)).over(byK))
      .withColumn("__t", termD)
      .groupBy((keyCols.map(col) ++ Seq(col("__n"), col("__k"))): _*)
      .agg(sum(col("__t")).as("__h"))
      .select(
        keyCols.map(col) ++ Seq(
          col("__n").as("n"),
          col("__k").as("n_distinct"),
          round(col("__h").cast("double"), 6).as("entropy"),
          round(when(col("__k") > 1,
            col("__h").cast("double") / log(col("__k").cast("double"))), 6)
            .as("norm_entropy")): _*)
  }

  /** Per-group ordinary-least-squares line fit — the trend readout
    * (is this user's metric drifting, is this source's quality
    * decaying over time): slope, intercept, and R² of y on x per key.
    *
    * ONE map-side-combinable rollup of EXACT decimal moments
    * (x at 6dp, y at 2dp — Σx, Σy, Σxy, Σx², Σy² as exact decimals,
    * the [[graft.ops.Experiment.cuped]] recipe), then the classic
    * closed forms as fixed-order double chains over those exact sums,
    * rounded 6dp:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    *
    * Degenerate groups (constant x → zero x-variance) yield NULL
    * slope/intercept/r2, flagged not crashed; constant y with varying
    * x fits slope 0 and NULL r² (no variance to explain). NULLs in
    * x/y fail loud. Moment magnitudes bound the contract: |x| ≤ 10⁶
    * and |y| ≤ 10⁵ keep Σx²·n inside the decimal-38 chain to ~10⁹
    * rows per group.
    *
    * Returns per key: `(keys…, n, slope, intercept, r2)`.
    */
  def linearFit(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "linearFit needs at least one key column")
    val x = col(xCol).cast("decimal(18,6)")
    val y = col(yCol).cast("decimal(18,2)")
    val guarded = df.where(
      when(col(xCol).isNull || col(yCol).isNull,
        raise_error(lit(s"linearFit: NULL in $xCol/$yCol — filter first")))
        .otherwise(lit(true)))
    val agg = guarded
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"),
        sum(y).as("__sy"),
        sum(x * y).as("__sxy"),
        sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val covN = nD * d("__sxy") - d("__sx") * d("__sy")
    val varXN = nD * d("__sxx") - d("__sx") * d("__sx")
    val varYN = nD * d("__syy") - d("__sy") * d("__sy")
    val slope = covN / varXN
    agg.select(
      keyCols.map(col) ++ Seq(
        col("n"),
        round(when(varXN > 0, slope), 6).as("slope"),
        round(when(varXN > 0, (d("__sy") - slope * d("__sx")) / nD), 6).as("intercept"),
        round(when(varXN > 0 && varYN > 0, covN * covN / (varXN * varYN)), 6).as("r2")): _*)
  }

  /** Mass-concentration readout of a grouping key — how unequal is
    * the corpus across keys (docs per host, events per user, tokens
    * per doc)? The curation dashboard number behind "one crawl host
    * is 40% of the corpus":
    *
    *  - Gini coefficient via the exact rank form
    *    Σ(2i − n − 1)·cᵢ / (n·Σc) over ascending-sorted per-key
    *    counts (tie order is irrelevant: equal c swap freely), 6dp
    *    half-up of the exact rational;
    *  - Herfindahl–Hirschman index Σ(cᵢ/Σc)² = Σcᵢ²/(Σc)², same
    *    treatment;
    *  - top-K mass share.
    *
    * ONE corpus-sized key rollup (map-side combinable) bounds the
    * rest; the rank fold runs on the bounded per-key frame in a
    * single-partition window — fine to ~10⁶ keys. Beyond that
    * (per-user keys at 100 TB), pre-bucket keys into count bands
    * first or rank via the [[graft.ts.GlobalSort]] partition-offset
    * path; the formulas only need (count, rank) pairs.
    *
    * Returns ONE row: `(n_keys, total, gini, hhi, topk_share)`.
    */
  def concentration(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val c = df
      .where(when(col(keyCol).isNull,
        raise_error(lit(s"concentration: NULL in $keyCol — filter first")))
        .otherwise(lit(true)))
      .groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val asc = Window.orderBy(col("__c").asc, col("__k").asc)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val ranked = c
      .withColumn("__i", row_number().over(asc))
      .withColumn("__nk", count(lit(1)).over(whole))
      .withColumn("__tot", sum(col("__c")).over(whole))
    val giniTerm = (col("__i").cast("decimal(38,0)") * 2 - col("__nk") - 1) * col("__c")
    ranked
      .groupBy("__nk", "__tot")
      .agg(
        sum(giniTerm).as("__gnum"),
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__c2"),
        sum(when(col("__i") > col("__nk") - topK, col("__c")).otherwise(0L)).as("__top"))
      .select(
        col("__nk").as("n_keys"),
        col("__tot").as("total"),
        (microHalfUp(col("__gnum") * lit(1000000L),
          col("__nk").cast("decimal(38,0)") * col("__tot"))
          .cast("double") / lit(1000000.0)).as("gini"),
        (microHalfUp(col("__c2") * lit(1000000L),
          col("__tot").cast("decimal(38,0)") * col("__tot"))
          .cast("double") / lit(1000000.0)).as("hhi"),
        (microHalfUp(col("__top").cast("decimal(38,0)") * lit(1000000L),
          col("__tot").cast("decimal(38,0)"))
          .cast("double") / lit(1000000.0)).as("topk_share"))
  }
}
