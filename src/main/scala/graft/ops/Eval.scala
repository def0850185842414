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
