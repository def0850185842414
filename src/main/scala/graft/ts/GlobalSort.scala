package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O2 — total-order GLOBAL rank/sort without a single-task global
  * window (the reference's out-of-core timestamp sort,
  * `jagular/utils.py` NotImplementedError territory): the classic
  * two-pass recipe with a twist that makes it ORACLE-DETERMINISTIC.
  *
  * `repartitionByRange` + per-partition offsets (the
  * [[Sessionize.withSegmentIdGlobal]] machinery) is the production
  * path, but its sampled range boundaries differ job to job, so the
  * pass-1 counts and the pass-2 window must be anchored by a persisted
  * RDD. Here the bucket is instead a PURE monotone function of the
  * value — `(ts − min) / width` over the collected (min, max) — so
  * both passes agree on any retry with nothing persisted, and the
  * result is a pure function of the data (hash-stable for the oracle).
  * Trade: value-split buckets are skew-prone on clustered timestamps
  * (sampled boundaries balance better); both shapes avoid the
  * single-task global sort, which is the property that matters at
  * 100 TB.
  */
object GlobalSort {

  /** 0-based global rank by (`tsCol`, `tieCols`...): one tiny (min,max)
    * aggregate, one per-bucket count pass (map-side combinable,
    * driver-collected offsets — O(buckets)), one within-bucket window.
    * Ties across the full key tuple get ranks by the tuple's order;
    * equal `tsCol` values always share a bucket. */
  def rankByValueBuckets(
      df: DataFrame,
      tsCol: String,
      tieCols: Seq[String],
      numBuckets: Int = 0
  ): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // min/count in one pass: count(col) vs count(*) disagreeing is the
    // NULL detector — a NULL ts would otherwise surface as a null
    // bucket key and a broken rank sequence
    val mm = df.agg(min(col(tsCol)), max(col(tsCol)), count(col(tsCol)), count(lit(1))).head()
    if (mm.isNullAt(0) && mm.getLong(3) == 0L)
      return df.withColumn("rank", lit(0L)).limit(0)
    require(mm.getLong(2) == mm.getLong(3),
      s"$tsCol contains NULLs (${mm.getLong(3) - mm.getLong(2)} rows) — a total order over NULL is undefined; filter or impute first")
    val mn = mm.getLong(0)
    val mx = mm.getLong(1)
    // fail fast on a range that overflows Long arithmetic (a column
    // spanning > 2^63): the bucket expression below would wrap silently
    val range =
      try math.subtractExact(mx, mn)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"$tsCol range [$mn, $mx] exceeds Long.MaxValue — rebase the timestamps first")
      }
    // width ≥ 1 and n·width covers the range — bucket ∈ [0, n-1]
    val width = math.max(1L, range / n + 1L)
    val bucket = least(((col(tsCol) - mn) / width).cast("int"), lit(n - 1))
    val withB = df.withColumn("__b", bucket)
    val counts = withB.groupBy("__b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, b) => acc + counts.getOrElse(b, 0L))
    val offsetMap = map((0 until n).flatMap(b => Seq(lit(b), lit(offsets(b)))): _*)
    val w = Window.partitionBy(col("__b"))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
    withB
      .withColumn("rank", element_at(offsetMap, col("__b")) + row_number().over(w) - 1)
      .drop("__b")
  }
}
