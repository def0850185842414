package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — the scorecard between [[Thresholds]]
  * (operating point) and [[Calibration]] (probability quality):
  * confusion counts and the per-class precision / recall / F1 report
  * over a predictions-vs-gold table.
  *
  * Everything is ONE map-side-combinable (label, pred) rollup —
  * bounded by the class-pair count, never the corpus — with the
  * per-class marginals derived by windows over that bounded frame
  * (no second scan, no singleton cross join). Ratios are single 6dp
  * double divisions of exact integer counts; F1 is computed in the
  * cleared form `2·tp / (2·tp + fp + fn)` — one division, no
  * intermediate rounding of precision/recall feeding it.
  */
object Eval {

  /** Raw confusion counts: one row per observed (label, pred) pair.
    * NULL labels or predictions are rejected loudly — silently
    * dropping them would misreport every marginal. */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val guarded = df.where(
      when(col(labelCol).isNull || col(predCol).isNull,
        raise_error(lit(s"Eval: NULL in $labelCol/$predCol — filter or impute first")))
        .otherwise(lit(true)))
    guarded
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Clustering-vs-labels agreement — the external validation pair
    * for any unsupervised grouping (k-means cells, LSH buckets, LPA
    * communities, dedup clusters) against gold classes:
    *
    *  - `purity` = Σ_cluster max_label n(cluster, label) / N — the
    *    fraction correctly assigned under the best per-cluster label;
    *  - `ari` = Adjusted Rand Index in the standard pair-counting
    *    form, FULLY integer-exact: with S = Σ_ij C(n_ij,2),
    *    A = Σ_i C(a_i,2), B = Σ_j C(b_j,2), P = C(n,2),
    *
    *      ari = (S·P − A·B) / (P·(A+B)/2 − A·B)
    *
    *    every term an exact integer (the C(·,2) halves cancel; the
    *    remaining /2 clears by doubling both sides), the final value
    *    one 6dp sign-aware half-up rational. Degenerate partitions
    *    (everything one pair mass, denominator 0) yield NULL ari.
    *    The 38-digit chain is exact to n ≈ 5·10⁷ rows; beyond that
    *    pre-aggregate or sample (decimal overflow NULLs, it doesn't
    *    corrupt).
    *
    * ONE (cluster, label) rollup bounds everything (the [[confusion]]
    * frame); marginals ride it as windows — no join.
    *
    * Returns ONE row: `(n, n_clusters, n_labels, purity, ari)`.
    */
  def clusteringAgreement(
      df: DataFrame,
      clusterCol: String,
      labelCol: String
  ): DataFrame = {
    val cm = confusion(df, clusterCol, labelCol)
      .withColumnRenamed("label", "__c")
      .withColumnRenamed("pred", "__l")
    val byC = Window.partitionBy("__c").rowsBetween(Long.MinValue, Long.MaxValue)
    val byL = Window.partitionBy("__l").rowsBetween(Long.MinValue, Long.MaxValue)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    def pairs2(c: org.apache.spark.sql.Column) = // 2·C(c,2) = c(c−1), exact
      c.cast("decimal(38,0)") * (c - 1L)
    val grid = cm
      .withColumn("__a", sum(col("n")).over(byC))
      .withColumn("__b", sum(col("n")).over(byL))
      .withColumn("__n", sum(col("n")).over(whole))
      // per-cluster best-label mass, counted once per cluster (on the
      // bytewise-first max row) — the majorityVote first-row trick
      .withColumn("__best", max(struct(col("n"), col("__l"))).over(byC))
      .withColumn("__pure",
        when(col("n") === col("__best.n") && col("__l") === col("__best.__l"),
          col("n")).otherwise(lit(0L)))
      // marginal pair masses counted once per cluster/label: only the
      // bytewise-first row of each group carries them
      .withColumn("__a2row",
        when(col("__l") === min(col("__l")).over(byC), pairs2(col("__a")))
          .otherwise(lit(0L).cast("decimal(38,0)")))
      .withColumn("__b2row",
        when(col("__c") === min(col("__c")).over(byL), pairs2(col("__b")))
          .otherwise(lit(0L).cast("decimal(38,0)")))
    val folded = grid
      .groupBy("__n")
      .agg(
        count_distinct(col("__c")).as("n_clusters"),
        count_distinct(col("__l")).as("n_labels"),
        sum(col("__pure")).as("__puremass"),
        sum(pairs2(col("n"))).as("__s2"),
        sum(col("__a2row")).as("__a2"),
        sum(col("__b2row")).as("__b2"))
    val p2 = col("__n").cast("decimal(38,0)") * (col("__n") - 1L)
    // ari = (S2·P2 − A2·B2) / (P2·(A2+B2)/2 − A2·B2); doubled form:
    val num = col("__s2") * p2 * 2 - col("__a2") * col("__b2") * 2
    val den = p2 * (col("__a2") + col("__b2")) - col("__a2") * col("__b2") * 2
    folded.select(
      col("__n").as("n"),
      col("n_clusters"),
      col("n_labels"),
      (microHalfUpE(col("__puremass").cast("decimal(38,0)") * lit(1000000L),
        col("__n").cast("decimal(38,0)")).cast("double") / lit(1000000.0)).as("purity"),
      when(den =!= 0,
        microHalfUpE(num * lit(1000000L), den).cast("double") / lit(1000000.0))
        .as("ari"))
  }

  private def microHalfUpE(
      num: org.apache.spark.sql.Column,
      den: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
    // den may be negative in the doubled-ARI form when the index is
    // degenerate-negative; normalize sign so half-up stays symmetric
    val sNum = when(den < 0, -num).otherwise(num)
    val sDen = abs(den)
    when(sNum >= 0, intDiv(sNum * 2 + sDen, sDen * 2))
      .otherwise(-intDiv((-sNum) * 2 + sDen, sDen * 2))
  }

  /** Per-class report over the union of observed label and pred
    * classes: (class, tp, fp, fn, precision, recall, f1) — 6dp
    * doubles, NULL where the denominator is 0 (a class never
    * predicted has no precision; a class never seen has no recall). */
  def classReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = confusion(df, labelCol, predCol)
    val byLabel = Window.partitionBy("label")
    val byPred = Window.partitionBy("pred")
    // marginals ride the bounded confusion frame: row_total(label) =
    // tp + fn, col_total(pred) = tp + fp
    val wide = cm
      .withColumn("__row_total", sum(col("n")).over(byLabel))
      .withColumn("__col_total", sum(col("n")).over(byPred))
    val diag = wide
      .where(col("label") === col("pred"))
      .select(
        col("label").as("class"), col("n").as("tp"),
        (col("__col_total") - col("n")).as("fp"),
        (col("__row_total") - col("n")).as("fn"))
    // classes with NO diagonal cell (never correctly predicted) still
    // report: tp = 0, fp = all predictions, fn = all golds
    val classes = cm.select(col("label").as("class"))
      .unionAll(cm.select(col("pred").as("class"))).distinct()
    val rowT = cm.groupBy(col("label").as("class")).agg(sum("n").as("__rt"))
    val colT = cm.groupBy(col("pred").as("class")).agg(sum("n").as("__ct"))
    val base = classes
      .join(rowT, Seq("class"), "left")
      .join(colT, Seq("class"), "left")
      .join(diag.select(col("class"), col("tp")), Seq("class"), "left")
      .select(
        col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("__ct"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("__rt"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
    base
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"), 6)))
      .withColumn("f1",
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          round((col("tp") * 2).cast("double") /
            (col("tp") * 2 + col("fp") + col("fn")).cast("double"), 6)))
  }
}
