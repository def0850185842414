package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Time-WEIGHTED average per (key, time bucket) — the irregular-series
  * complement of [[graft.ops.Resample.ohlc]]'s plain mean: each
  * observation's value HOLDS from its timestamp until the next
  * observation (step interpolation), so sparse and bursty series
  * average by exposure time, not by sample count (the difference
  * between "average price" and "average price while quoted").
  *
  * Semantics (mirrored term for term by the oracle):
  *  - segment i = `[t_i, min(t_{i+1}, t_i + maxHoldUs))`; the last
  *    observation's segment ends at `min(end-of-its-bucket,
  *    t_i + maxHoldUs)` — a value never holds past the staleness
  *    cutoff `maxHoldUs`, which is ALSO the scale bound: a segment
  *    explodes over at most `maxHoldUs/bucketUs + 1` buckets, however
  *    long the gap to the next observation;
  *  - per bucket: `twap = round(Σ v·dur / Σ dur, 6)` with `v` read at
  *    2dp DECIMAL and `dur` in integer micros, so the weighted sum is
  *    EXACT and the single double division is the only float step.
  *
  * Execution shape: one key-partitioned window (the `lead`), a bounded
  * `sequence` explode (the [[IntervalJoin]] bucketization), one
  * (key, bucket) rollup — all hash exchanges, no nested loop, no
  * driver state. Integer epoch timestamps required (same contract and
  * bucket arithmetic as [[IntervalJoin]]); per-key-unique timestamps
  * are the caller's contract (ties make `lead` order undefined).
  *
  * @return keyCols + (bucket_start, n_segments, dur_us, twap)
  */
object Twap {

  private def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  def twap(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      bucketUs: Long,
      maxHoldUs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "twap needs at least one key column")
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(maxHoldUs >= 1, s"maxHoldUs must be >= 1, got $maxHoldUs")
    val key = keyCols.map(col)
    val wo = Window.partitionBy(key: _*).orderBy(col(tsCol))
    def bucketOf(c: Column): Column =
      intDiv(c - pmod(c, lit(bucketUs)), lit(bucketUs)).cast("long")
    val ts = col(tsCol).cast("long")
    val bucketEnd = (bucketOf(ts) + 1) * bucketUs
    val segs = df
      .where(col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(key ++ Seq(
        ts.as("__s"),
        least(
          coalesce(lead(ts, 1).over(wo), bucketEnd),
          ts + maxHoldUs).as("__e"),
        col(valCol).cast("decimal(18,2)").as("__v")): _*)
      .where(col("__e") > col("__s"))
    val exploded = segs
      .withColumn("__b", explode(
        sequence(bucketOf(col("__s")), bucketOf(col("__e") - 1))))
      .withColumn("__dur",
        least(col("__e"), (col("__b") + 1) * bucketUs) -
          greatest(col("__s"), col("__b") * bucketUs))
    exploded
      .groupBy(key :+ (col("__b") * bucketUs).as("bucket_start"): _*)
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__dur")).as("dur_us"),
        sum(col("__v") * col("__dur")).as("__num"))
      .withColumn("twap",
        round(col("__num").cast("double") / col("dur_us").cast("double"), 6))
      .drop("__num")
  }
}
