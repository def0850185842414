package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality profiling — the validation gate a training
  * pipeline runs on every ingest batch before the data is allowed to
  * flow (the Deequ/TFDV job): per-column completeness, distinct
  * cardinality, range, and mean, computed for ALL columns in ONE
  * map-side-combinable aggregate over the table. At 100 TB this is
  * the difference between one scan and |columns| scans; nothing here
  * shuffles more than the single combined aggregation row.
  *
  * Distinct counts ride the [[graft.functions.KMinValues]] sketch over
  * the repo's deterministic 60-bit md5 hash — O(k) state per column,
  * EXACT below k distinct values, and (unlike HLL) replayable by an
  * independent engine, so the whole profile is hash-checkable.
  *
  * Determinism contract: the caller projects columns to types with an
  * engine-stable string form before profiling (decimals, integers,
  * dates, strings — NOT raw doubles, whose string rendering differs
  * across engines in the exponent-notation corners); numeric stats are
  * exact DECIMAL sums divided once at the end.
  */
object Profile {

  /** Profile `numericCols` (stats over the value) and `stringCols`
    * (stats over `length(value)`; distinct over the value itself) in
    * one aggregate pass.
    *
    * @return one row per column:
    *         (column, n_rows, n_null, n_distinct, min, max, mean) —
    *         n_distinct is the KMV estimate (exact below k), min/max/
    *         mean as doubles (mean = exact decimal sum / count,
    *         rounded 6dp, null for an all-null column)
    */
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String] = Nil,
      k: Int = 64
  ): DataFrame = {
    val cols = checkCols(numericCols, stringCols, k)
    val agg = df.agg(count(lit(1)).as("__n"), aggExprs(cols, k): _*)
    agg.select(explode(rowStructs(cols, k)).as("__p")).select(col("__p.*"))
  }

  private[graft] def checkCols(
      numericCols: Seq[String],
      stringCols: Seq[String],
      k: Int
  ): Seq[(String, Boolean)] = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    require(k >= 2, s"k must be >= 2 for the (k-1) estimator, got $k")
    numericCols.map((_, false)) ++ stringCols.map((_, true))
  }

  /** The per-column aggregate battery — shared verbatim by the batch
    * pass and the windowed streaming twin
    * ([[graft.streaming.Streaming.profileStream]]), so both walk the
    * identical count/KMV/min/max/decimal-sum chain. */
  private[graft] def aggExprs(cols: Seq[(String, Boolean)], k: Int): Seq[Column] =
    cols.flatMap { case (name, isString) =>
      val v = if (isString) length(col(name)) else col(name)
      Seq(
        count(col(name)).as(s"__${name}__nn"),
        graft.functions.KMinValues
          .kMinValues(Cardinality.itemHash(col(name).cast("string")), k)
          .as(s"__${name}__kmv"),
        min(v.cast("double")).as(s"__${name}__mn"),
        max(v.cast("double")).as(s"__${name}__mx"),
        sum(v.cast("decimal(38,6)")).as(s"__${name}__sm"))
    }

  /** The aggregate row → per-column report structs (the [[aggExprs]]
    * counterpart; explode the result to get the long-format rows). */
  private[graft] def rowStructs(cols: Seq[(String, Boolean)], k: Int): Column =
    array(cols.map { case (name, _) =>
      val (_, est) = Cardinality.estimate(col(s"__${name}__kmv"), k)
      struct(
        lit(name).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${name}__nn")).as("n_null"),
        est.as("n_distinct"),
        col(s"__${name}__mn").as("min"),
        col(s"__${name}__mx").as("max"),
        when(col(s"__${name}__nn") > 0,
          round(col(s"__${name}__sm").cast("double") / col(s"__${name}__nn"), 6))
          .as("mean"))
    }: _*)
}
