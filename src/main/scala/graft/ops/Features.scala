package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time feature engineering — the two primitives a tabular /
  * event-driven training pipeline needs to build leakage-free features
  * at 100 TB:
  *
  *  - [[trailing]]: per event, aggregates over the key's STRICTLY
  *    PRIOR events inside a lookback horizon (the "activity in the
  *    last 7 days" feature family). The upper bound excludes the
  *    current row — a feature that can see its own event is label
  *    leakage, the classic backfill bug.
  *  - [[targetEncodeLoo]]: leave-one-out category → label-mean
  *    encoding — each row's own label is subtracted from its
  *    category's sum, the equally classic target-leak fix for mean
  *    encoding.
  *
  * Both are ONE exchange each: trailing is a single event-time RANGE
  * window per key partition (codegen'd running frame, no self-join —
  * the naive `events ⋈ events ON ts BETWEEN` respelling is O(n·m)
  * per key); target encoding is one map-side-combinable category
  * rollup joined back (broadcast-sized for any sane category
  * cardinality). Sums run in exact DECIMAL so the results are
  * engine-replayable.
  */
object Features {

  /** Trailing-window features: for every event, the count and
    * exact-decimal sum of `valCol` over the same key's events with
    * timestamp in `[ts − lookbackUs, ts − 1]` (strictly prior —
    * point-in-time correct; simultaneous events at the SAME timestamp
    * are excluded with it, which is the leakage-safe reading of a
    * tie).
    *
    * @param tsCol  epoch-microsecond long event time
    * @return input columns + (n_prior, sum_prior 2dp, mean_prior 6dp —
    *         null when n_prior = 0)
    */
  def trailing(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      lookbackUs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "trailing features need at least one key column")
    require(lookbackUs >= 1, s"lookbackUs must be >= 1, got $lookbackUs")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
      .rangeBetween(-lookbackUs, -1)
    val v = col(valCol).cast("decimal(18,2)")
    events
      .withColumn("n_prior", count(v).over(w))
      .withColumn("sum_prior", sum(v).over(w))
      .withColumn(
        "mean_prior",
        when(col("n_prior") > 0,
          round(col("sum_prior").cast("double") / col("n_prior"), 6)))
  }

  /** Equal-frequency quantile binning: each row gets the bin index
    * (0 … nBins−1) of `valCol` under the corpus's own distribution —
    * the standard numeric-feature discretization (and the
    * distribution-free outlier cap: winsorize = clamp to bins 0 and
    * nBins−1's cut values). Cut points come from
    * [[Profile.histQuantiles]] (two bounded passes: one min/max fold,
    * one bucket rollup bounded by `buckets` at ANY corpus size — no
    * per-column sort), collected driver-side as nBins−1 doubles (the
    * deterministic, oracle-replayable estimator — same cuts on every
    * engine), then assignment is a stateless codegen'd projection:
    * `bin = #cuts ≤ value`. NULL values get a NULL bin.
    */
  def quantileBin(
      df: DataFrame,
      valCol: String,
      nBins: Int,
      buckets: Int = 1000
  ): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val cuts = graft.ops.Profile
      .histQuantiles(df, Seq(valCol), probs, buckets)
      .collect()
      .sortBy(_.getDouble(1))
      .map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    require(!cuts.exists(_.isNaN), s"quantileBin: $valCol has no non-null values")
    val v = col(valCol).cast("double")
    val cutArr = array(cuts.map(lit(_)): _*)
    df.withColumn(
      "bin",
      when(v.isNotNull, size(filter(cutArr, c => c <= v))).otherwise(lit(null).cast("int")))
  }

  /** Leave-one-out target encoding: per row, the mean of `labelCol`
    * over the OTHER rows of the same `catCol` category —
    * `(Σ_cat − y) / (n_cat − 1)`, null for singleton categories (no
    * other row to borrow from) and for null labels. Exact DECIMAL
    * sums; mean rounded 6dp.
    *
    * @return input columns + (n_cat, loo_mean)
    */
  /** Winsorization — clamp a numeric column at estimated percentile
    * cuts (the standard heavy-tail tamer before a feature feeds a
    * mean/σ-sensitive consumer). Cuts come from the deterministic
    * [[Profile.histQuantiles]] estimator (two bounded passes, exactly
    * engine-replayable), collected as TWO scalars (the histQuantiles
    * driver-row precedent — bounded by construction, never data-
    * sized); the clamp itself is a stateless codegen'd projection.
    *
    * @return input columns + `<valCol>_w` (clamped double; null rides
    *         through)
    */
  def winsorize(
      df: DataFrame,
      valCol: String,
      pLo: Double,
      pHi: Double,
      buckets: Int = 1024
  ): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi, s"need 0 < pLo < pHi <= 1, got [$pLo, $pHi]")
    val qs = Profile.histQuantiles(df, Seq(valCol), Seq(pLo, pHi), buckets)
      .collect()
      .map(r => r.getDouble(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    (qs(pLo), qs(pHi)) match {
      case (Some(lo), Some(hi)) =>
        // guard nulls explicitly: Spark's greatest/least SKIP nulls
        // (a null value would otherwise clamp to the low cut)
        df.withColumn(s"${valCol}_w",
          when(col(valCol).isNotNull,
            least(greatest(col(valCol).cast("double"), lit(lo)), lit(hi))))
      case _ => // all-null column: nothing to clamp
        df.withColumn(s"${valCol}_w", col(valCol).cast("double"))
    }
  }

  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("decimal(18,2)")
    val stats = df
      .groupBy(col(catCol))
      .agg(count(y).as("n_cat"), sum(y).as("__sum"))
    df.join(stats, Seq(catCol), "left")
      .withColumn(
        "loo_mean",
        when(y.isNotNull && col("n_cat") > 1,
          round(((col("__sum") - y).cast("double")) / (col("n_cat") - 1), 6)))
      .drop("__sum")
  }
}
