package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Scalable INTERVAL (containment) join: attach to every point row the
  * interval(s) `[start, stop)` containing it — event→epoch attribution,
  * reading→session assignment, the range-predicate join Spark executes
  * as a BroadcastNestedLoopJoin if written naively (the banned plan).
  *
  * The scale spelling is BUCKETIZATION: time is cut into fixed-width
  * buckets, each interval EXPLODES into every bucket it overlaps
  * (sequence over the bucket range), points key to their single bucket,
  * and the join is a plain equi-join on the bucket id with the exact
  * containment predicate as a post-filter. Each qualifying (point,
  * interval) pair meets in exactly one bucket — the point's — so no
  * dedup is needed. Cost: |intervals| × (width/bucketWidth) exploded
  * rows + one hash join; pick `bucketWidth` near the typical interval
  * width so the explosion factor stays O(1). Long intervals fan out
  * across buckets (bounded, linear), hot buckets parallelize like any
  * equi-join key. No nested loop at any scale.
  */
object IntervalJoin {

  /** Exact floor-division bucket index over INTEGER time columns:
    * `(c - pmod(c, w)) div w`, all in long arithmetic. The obvious
    * `floor(c / w)` goes through DOUBLE division, whose 53-bit
    * mantissa can place an endpoint above 2^53 one bucket off —
    * which would break the exactly-once bucket-of-max-start emission,
    * not just a boundary cosmetic. */
  private def bucketOf(c: Column, bucketWidth: Long): Column =
    Bridge.column(IntegralDivide(
      Bridge.expression(c - pmod(c, lit(bucketWidth))),
      Bridge.expression(lit(bucketWidth)))).cast("long")

  /** Time columns must be integral (epoch micros/millis/seconds):
    * the bucket arithmetic and the `stop - 1` last-covered-instant
    * step are exact only on integers — a fractional time column
    * must be scaled to integer units by the caller. */
  private def requireIntegral(df: DataFrame, cols: Seq[String], what: String): Unit =
    cols.foreach { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"$what column '$c' must be an integer epoch type, got ${other.catalogString}: " +
            "scale fractional time to integer units before the interval join")
      }
    }

  /** Join `points` (with `tsCol`) to `intervals` (with `startCol`,
    * `stopCol`; half-open `[start, stop)`), emitting every point row
    * paired with every containing interval row (inner semantics —
    * uncovered points drop). Columns from both sides survive; name
    * collisions are the caller's to resolve beforehand. */
  def containmentJoin(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      stopCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    requireIntegral(points, Seq(tsCol), "containmentJoin time")
    requireIntegral(intervals, Seq(startCol, stopCol), "containmentJoin time")
    def bucketOf(c: Column): Column = IntervalJoin.bucketOf(c, bucketWidth)
    val p = points.withColumn("__b", bucketOf(col(tsCol)))
    // stop is exclusive: an interval touching a bucket only at its stop
    // boundary contributes nothing there — (stop - 1) is the last
    // covered instant. Inverted/empty intervals (start >= stop) must
    // explode to NOTHING: a bare sequence(a, b) with a > b auto-steps
    // -1 and would fan a single corrupt row into a huge descending
    // bucket list before the post-filter could drop it.
    val iv = intervals.withColumn(
      "__b",
      explode(
        when(col(startCol) < col(stopCol),
          sequence(bucketOf(col(startCol)), bucketOf(col(stopCol) - 1)))
          .otherwise(lit(Array.empty[Long]))))
    p.join(iv, Seq("__b"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(stopCol))
      .drop("__b")
  }

  /** Scalable interval×interval OVERLAP join: every pair of intervals
    * `[aStart, aStop) × [bStart, bStop)` (optionally within the same
    * `keyCols`) with a non-empty intersection, plus the intersection
    * itself (`overlap_start`, `overlap_stop`) — epoch-set
    * intersection, session×outage attribution, A/B exposure overlap.
    * Naively this is another range-predicate nested loop; the scale
    * spelling is the same bucketization as [[containmentJoin]], with
    * one twist replacing the dedup an interval×interval meet would
    * otherwise need: an overlapping pair shares every bucket their
    * spans both cover, but exactly ONE of those buckets contains
    * `max(aStart, bStart)` (the intersection's first instant — always
    * inside both spans), so the join keeps the pair only where
    * `bucket = bucketOf(max(starts))` and emits it exactly once, no
    * distinct. Cost: each side explodes by its span/bucketWidth (pick
    * bucketWidth near the typical interval width), then ONE equi-join
    * on (key, bucket). Empty/inverted intervals explode to nothing.
    * Columns from both sides survive; name collisions (other than
    * `keyCols`, which join-merge) are the caller's to resolve
    * beforehand, as in [[containmentJoin]].
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aStop: String,
      bStart: String,
      bStop: String,
      bucketWidth: Long,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    requireIntegral(a, Seq(aStart, aStop), "overlapJoin time")
    requireIntegral(b, Seq(bStart, bStop), "overlapJoin time")
    def bucketOf(c: Column): Column = IntervalJoin.bucketOf(c, bucketWidth)
    def exploded(df: DataFrame, start: String, stop: String): DataFrame =
      df.withColumn(
        "__b",
        explode(
          when(col(start) < col(stop),
            sequence(bucketOf(col(start)), bucketOf(col(stop) - 1)))
            .otherwise(lit(Array.empty[Long]))))
    exploded(a, aStart, aStop)
      .join(exploded(b, bStart, bStop), keyCols :+ "__b")
      .where(
        col(aStart) < col(bStop) && col(bStart) < col(aStop) &&
          col("__b") === bucketOf(greatest(col(aStart), col(bStart))))
      .withColumn("overlap_start", greatest(col(aStart), col(bStart)))
      .withColumn("overlap_stop", least(col(aStop), col(bStop)))
      .drop("__b")
  }
}
