package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Timestamp-stream validation (F12/F13/F14, jagular/utils.py:292-390):
  * the invariants the reference enforces as asserts become a one-row
  * report DataFrame — integrality, sortedness, duplicate count — usable
  * both as a query and as a post-write assertion
  * (`check_timestamps`, jagular/utils.py:544-547).
  */
object Validation {

  /** One-row report: (n_rows, n_dup_keys, n_out_of_order, is_sorted,
    * has_dups). Sortedness is judged against `orderCol` ordering
    * (A7, jagular/utils.py:54-74: any `x[i+1] < x[i]`). Uses the two-pass
    * [[OrderedStream]] neighbor exchange, not a keyless window. */
  def report(df: DataFrame, tsCol: String, orderCol: String): DataFrame = {
    val withPrev = OrderedStream
      .withNeighbors(df, orderCol, Seq(tsCol))
      .withColumnRenamed(s"__prev_$tsCol", "__prev")
    withPrev.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(tsCol)).as("n_distinct_ts"),
      // coalesce: sum over ZERO rows is NULL, which would make is_sorted
      // NULL too (the oracle COALESCEs identically)
      coalesce(sum(when(col(tsCol) < col("__prev"), 1L).otherwise(0L)), lit(0L))
        .as("n_out_of_order")
    ).select(
      col("n_rows"),
      (col("n_rows") - col("n_distinct_ts")).as("n_dup_rows"),
      col("n_out_of_order"),
      (col("n_out_of_order") === 0L).cast("int").as("is_sorted"),
      (col("n_rows") > col("n_distinct_ts")).cast("int").as("has_dups")
    )
  }

  /** Integrality predicate (F12, jagular/utils.py:297-306): every value of
    * `c` castable to long without loss. One-row (n_non_integral). */
  def nonIntegralCount(df: DataFrame, c: String): DataFrame =
    df.agg(
      sum(when(col(c).cast("long").cast(df.schema(c).dataType) =!= col(c), 1L).otherwise(0L))
        .as("n_non_integral")
    )

  /** P6: `request_data`-style time-range fetch
    * (jagular/io.py:204-232): validates `[start, stop] ⊆ [sessionStart,
    * sessionStop]` BEFORE touching data (the catalog check), then returns
    * the ts-bounded slice — which Catalyst turns into a pushed-down
    * parquet range filter. */
  def requestRange(
      df: DataFrame,
      tsCol: String,
      start: Long,
      stop: Long,
      sessionStart: Long,
      sessionStop: Long
  ): DataFrame = {
    require(start <= stop, s"start $start > stop $stop")
    require(
      start >= sessionStart && stop <= sessionStop,
      s"requested [$start, $stop] outside session [$sessionStart, $sessionStop]"
    )
    df.where(col(tsCol).between(start, stop))
  }
}
