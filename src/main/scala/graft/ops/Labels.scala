package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-quality operators for supervised training data — the QA a
  * labeling pipeline runs between raw annotations and the training
  * table:
  *
  *  - [[majorityVote]]: per-item label resolution with agreement
  *    stats (the aggregation step of every multi-rater labeling job);
  *  - [[cohenKappa]]: chance-corrected inter-rater agreement between
  *    two raters (Cohen 1960) — the standard "are these annotations
  *    better than coin flips" gate.
  *
  * Both are map-side-combinable aggregates over (item, label) /
  * label-pair counts — bounded by items × labels, never by
  * annotation volume; no window, no driver state. Every ratio is
  * derived from exact integer counts with the sign-aware half-up
  * integral-division recipe ([[Text.readability]]), so the numbers
  * are engine-replayable bit-for-bit.
  */
object Labels {

  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  /** 6dp half-up of num/den over exact integer columns (den > 0). */
  private def ratio6(num: Column, den: Column): Column = {
    val u = (num.cast("decimal(38,0)") * lit(1000000))
    val micro = when(u >= 0, intDiv(u * 2 + den, den * 2))
      .otherwise(-intDiv((-u) * 2 + den, den * 2))
    micro.cast("double") / lit(1000000.0)
  }

  /** Per-item majority label over a (item, rater, label) annotation
    * table: `label` = the most-voted label (ties broken by the
    * bytewise smallest label — deterministic under any partitioning),
    * `n_votes` = total annotations for the item, `n_agree` = votes
    * for the winner, `agreement` = 6dp n_agree/n_votes. EXACT
    * duplicate annotations (same item, rater, label) count once; a
    * rater re-voting a DIFFERENT label counts twice — resolve
    * re-votes first via [[Changelog.compact]] keyed on (item, rater)
    * with the annotation timestamp. NULL labels are dropped.
    *
    * Two map-side-combinable exchanges: (item, label) vote counts,
    * then the per-item argmax via one `min(struct(-cnt, label))`.
    */
  def majorityVote(
      annotations: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String
  ): DataFrame = {
    val votes = annotations
      .select(col(itemCol).as("item"), col(raterCol).as("__r"),
        col(labelCol).cast("string").as("__l"))
      .where(col("__l").isNotNull)
      .distinct()
      .groupBy(col("item"), col("__l"))
      .agg(count(lit(1)).as("__cnt"))
    votes
      .groupBy("item")
      .agg(
        min(struct((-col("__cnt")).as("nc"), col("__l").as("l"))).as("__w"),
        sum(col("__cnt")).as("n_votes"))
      .select(
        col("item"),
        col("__w.l").as("label"),
        (-col("__w.nc")).as("n_agree"),
        col("n_votes"))
      .withColumn("agreement", ratio6(col("n_agree"), col("n_votes")))
  }

  /** Per-rater accuracy against the [[majorityVote]]-resolved labels —
    * the annotator-quality report a labeling pipeline uses to weight
    * or retire raters. For each rater: items annotated, matches with
    * the resolved label, 6dp accuracy. One equi-join of the
    * annotations against the (broadcast-sized per item-count) resolved
    * table + one rater rollup; a rater's own vote is NOT excluded from
    * the majority (the usual reading; leave-one-out resolution would
    * need per-rater re-resolution).
    */
  def raterAccuracy(
      annotations: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String
  ): DataFrame = {
    val resolved = majorityVote(annotations, itemCol, raterCol, labelCol)
      .select(col("item"), col("label").as("__maj"))
    annotations
      .select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).cast("string").as("__l"))
      .where(col("__l").isNotNull)
      .distinct()
      .join(resolved, "item")
      .groupBy("rater")
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("__l") === col("__maj"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("accuracy", ratio6(col("n_match"), col("n_items")))
  }

  /** Cohen's kappa between two raters over a paired (labelA, labelB)
    * table (one row per co-annotated item; rows with a NULL side are
    * dropped). Returns ONE row of exact integers plus the 6dp kappa:
    * `n` items, `n_agree`, `sum_marginal` = Σ_k cntA(k)·cntB(k), and
    * `kappa = (n·n_agree − Σ) / (n² − Σ)` — the po/pe form cleared of
    * denominators, so the only rounding is the final 6dp half-up.
    * NULL kappa when pe = 1 (both raters constant — kappa undefined).
    *
    * Shape: one (label-pair) rollup for agreement + two label-margin
    * rollups joined on label — all bounded by the label vocabulary.
    */
  def cohenKappa(pairs: DataFrame, labelACol: String, labelBCol: String): DataFrame = {
    val p = pairs
      .select(col(labelACol).cast("string").as("__a"), col(labelBCol).cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    val base = p.agg(
      count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("n_agree"))
    val margA = p.groupBy(col("__a").as("__l")).agg(count(lit(1)).as("__ca"))
    val margB = p.groupBy(col("__b").as("__l")).agg(count(lit(1)).as("__cb"))
    val sm = margA.join(margB, "__l")
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("sum_marginal"))
    val num = col("n") * col("n_agree") - col("sum_marginal")
    val den = col("n") * col("n") - col("sum_marginal")
    // combine the two single-row aggregates by UNION + one final fold
    // — joining singletons (cross, or any foldable-key equi-join)
    // plans as a BroadcastNestedLoopJoin, which the plan-shape gate
    // forbids globally; the union shape has no join at all
    base.select(col("n"), col("n_agree"), lit(0L).as("sum_marginal"))
      .unionAll(sm.select(lit(0L).as("n"), lit(0L).as("n_agree"), col("sum_marginal")))
      .agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("n_agree"), lit(0L)).as("n_agree"),
        coalesce(sum("sum_marginal"), lit(0L)).as("sum_marginal"))
      .withColumn("kappa", when(den =!= 0, ratio6(num, den)))
      .select("n", "n_agree", "sum_marginal", "kappa")
  }

  /** Krippendorff's alpha (nominal) over an (item, rater, label)
    * annotation table — the agreement coefficient that HANDLES
    * MISSING ratings (abstentions, partial coverage, any number of
    * raters per item), which [[cohenKappa]]'s fixed-two-rater pairing
    * cannot: the gate for real crowdsourced labels where coverage is
    * ragged.
    *
    * Standard coincidence-matrix form: an item with m ≥ 2 ratings
    * contributes each ordered same-label pair at weight 1/(m−1);
    * items with one rating carry no pairable information and drop.
    * The 1/(m−1) weights are made EXACT by scaling with
    * L = lcm(1 … maxRaters−1) (a literal; m > maxRaters fails loud),
    * so observed agreement is a pure integer sum and
    *
    *   α = 1 − Do/De,  Do = (nL − agree)/(nL),
    *   De = (n² − Σ_label n_label²)/(n(n−1))
    *
    * evaluates as ONE exact rational → 6dp sign-aware half-up (α can
    * be negative under systematic disagreement). All-one-label input
    * has De = 0 → NULL alpha, flagged not crashed.
    *
    * ONE chain: (item, label) counts → per-item m via a keyed window
    * (bounded by labels per item) → per-label partial sums → a final
    * bounded fold. No singleton join, no driver state. NULL labels
    * are dropped (an abstention, not a vote).
    *
    * Returns ONE row: `(n_items, n, do, de, alpha)`.
    */
  def krippendorffAlpha(
      annotations: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String,
      maxRaters: Int = 10
  ): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 12,
      s"maxRaters must be in [2,12] (lcm growth), got $maxRaters")
    def lcm(a: BigInt, b: BigInt): BigInt = a * b / a.gcd(b)
    val bigL = (1 until maxRaters).map(BigInt(_)).reduce(lcm)
    val L = bigL.toLong
    import org.apache.spark.sql.expressions.Window
    val cnt = annotations
      .where(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    val byI = Window.partitionBy("__i").rowsBetween(Long.MinValue, Long.MaxValue)
    val withM = cnt
      .withColumn("__m", sum(col("__c")).over(byI))
      .withColumn("__m",
        when(col("__m") > maxRaters, raise_error(lit(
          s"krippendorffAlpha: an item has more than $maxRaters ratings — raise maxRaters")))
          .otherwise(col("__m")))
      .where(col("__m") >= 2)
      // exactly one row per item carries the min label → items counted once
      .withColumn("__first",
        when(col("__l") === min(col("__l")).over(byI), 1L).otherwise(0L))
    val perLabel = withM
      .withColumn("__w", intDiv(lit(L), col("__m") - 1L))
      .groupBy("__l")
      .agg(
        sum(col("__c")).as("__nl"),
        sum(col("__c") * (col("__c") - 1L) * col("__w")).as("__agr"),
        sum(col("__first")).as("__items"))
    val folded = perLabel
      .groupBy()
      .agg(
        coalesce(sum(col("__items")), lit(0L)).as("n_items"),
        coalesce(sum(col("__nl")), lit(0L)).as("n"),
        coalesce(sum(col("__agr")), lit(0L)).as("__agree"),
        coalesce(sum(col("__nl").cast("decimal(38,0)") * col("__nl")), lit(0L).cast("decimal(38,0)"))
          .as("__sumsq"))
    val n38 = col("n").cast("decimal(38,0)")
    val nL = n38 * L
    val doNum = nL - col("__agree")
    val deNum = n38 * col("n") - col("__sumsq")
    val deDen = n38 * (col("n") - 1L)
    // α = [nL·deNum − doNum·deDen] / [nL·deNum]
    folded.select(
      col("n_items"),
      col("n"),
      when(col("n") > 0, ratio6(doNum, nL)).as("do"),
      when(col("n") > 1, ratio6(deNum, deDen)).as("de"),
      when(deNum > 0, ratio6(nL * deNum - doNum * deDen, nL * deNum)).as("alpha"))
  }

  /** Class-balanced sampling weights — sklearn's `balanced` heuristic
    * weight_c = N / (K · n_c) per label (K = number of classes), the
    * per-example weight that equalizes class mass in a skewed training
    * table. One bounded label rollup + one whole-frame window for
    * N and K; the weight is the 6dp half-up of the exact rational
    * (share is the 6dp class prevalence). NULL labels are rejected
    * loudly — silently dropping them would re-skew the weights. */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = df.where(
      when(col(labelCol).isNull,
        raise_error(lit(s"classWeights: NULL in $labelCol — filter or impute first")))
        .otherwise(lit(true)))
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    guarded
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__total", sum(col("n")).over(whole))
      .withColumn("__k", count(lit(1)).over(whole))
      .select(
        col("label"),
        col("n"),
        ratio6(col("n").cast("decimal(38,0)"), col("__total")).as("share"),
        ratio6(col("__total").cast("decimal(38,0)"),
          col("__k").cast("decimal(38,0)") * col("n")).as("weight"))
  }
}
