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
    * (A7, jagular/utils.py:54-74: any `x[i+1] < x[i]`).
    *
    * Long timestamps (the engine's convention) take a dedicated
    * aggregate-only path: ONE range-sorted stats pass collecting, per
    * partition, (rows, local violations, first/last ts in order) — the
    * driver adds the O(partitions) boundary comparisons — plus one
    * countDistinct aggregate. No persist of the sorted stream, no
    * materialized neighbor columns: the general
    * [[OrderedStream.withNeighbors]] route (kept as the fallback for
    * non-long ts types) caches the ENTIRE dataset to anchor its two
    * passes, which is the wrong trade when the consumer only wants five
    * scalars from a 100 TB recording. */
  def report(df: DataFrame, tsCol: String, orderCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => reportLongTs(df, tsCol, orderCol)
      case _ => reportViaNeighbors(df, tsCol, orderCol)
    }

  private def reportLongTs(df: DataFrame, tsCol: String, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .select(col(orderCol), col(tsCol))
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    // SQL null semantics, like the neighbor form: a comparison involving
    // a NULL ts (either side) is no violation
    val stats = org.apache.spark.sql.graftbridge.Bridge
      .toInternalRdd(sorted)
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val firstNull = first.isNullAt(1)
          val firstTs = if (firstNull) 0L else first.getLong(1)
          var prevNull = firstNull
          var prev = firstTs
          var viol = 0L
          var rows = 1L
          it.foreach { r =>
            val isNull = r.isNullAt(1)
            val ts = if (isNull) 0L else r.getLong(1)
            if (!isNull && !prevNull && ts < prev) viol += 1
            prevNull = isNull; prev = ts; rows += 1
          }
          Iterator.single((pid, rows, viol, firstNull, firstTs, prevNull, prev))
        }
      }
      .collect()
      .sortBy(_._1)
    // n_rows comes from the SAME scan as n_out_of_order (per-partition row
    // counts), so those three report fields are mutually consistent even
    // on a non-deterministic input
    val nRows = stats.map(_._2).sum
    var outOfOrder = stats.map(_._3).sum
    var prevLastNull = true
    var prevLast = Long.MinValue
    stats.foreach { case (_, _, _, firstNull, first, lastNull, last) =>
      if (!prevLastNull && !firstNull && first < prevLast) outOfOrder += 1
      prevLastNull = lastNull
      prevLast = last
    }
    // the distinct count needs its own hash aggregate (the stats pass is
    // ordered by orderCol, not ts); on a non-deterministic input this
    // second scan may see different rows — n_dup_rows then reflects that
    // scan, and the max(0, _) guard keeps it from going negative rather
    // than caching the full stream just to pin five scalars
    val nDistinct = df.agg(countDistinct(col(tsCol))).first().getLong(0)
    val nDup = math.max(0L, nRows - nDistinct)
    import spark.implicits._
    Seq((nRows, nDup, outOfOrder,
      if (outOfOrder == 0L) 1 else 0, if (nDup > 0L) 1 else 0))
      .toDF("n_rows", "n_dup_rows", "n_out_of_order", "is_sorted", "has_dups")
  }

  /** Type-generic fallback via the neighbor exchange. */
  private[graft] def reportViaNeighbors(df: DataFrame, tsCol: String, orderCol: String): DataFrame = {
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

  /** Integrality predicate (F12, jagular/utils.py:297-306): every value
    * of `c` integral (no fractional part). One-row (n_non_integral).
    * Spelled `v % 1 ≠ 0` rather than a long-cast round-trip or floor():
    * both of those overflow/throw on |v| ≥ 2⁶³ (Spark's floor(double)
    * returns LONG) and disagree across engines on NaN, while IEEE
    * remainder is total — NaN % 1 = NaN ≠ 0 and ±Inf % 1 = NaN ≠ 0 on
    * BOTH engines (non-finite counts as non-integral, which is what a
    * "castable to long" validation wants), large finite doubles are
    * exact fixed points, and nothing can throw under ANSI. */
  def nonIntegralCount(df: DataFrame, c: String): DataFrame =
    df.agg(
      coalesce(sum(when(col(c) % lit(1.0) =!= 0.0, 1L).otherwise(0L)), lit(0L))
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
