package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucket downsampling of an event/metric stream — the telemetry
  * rollup (per key and fixed bucket: open/high/low/close + count/sum/
  * mean) that turns a raw 100 TB event log into a queryable series.
  *
  * ONE map-side-combinable exchange: open/close ride `min_by`/`max_by`
  * on the timestamp (partial-merge-safe argmin/argmax — no window, no
  * sort, no per-key history), high/low/count/sum are plain algebraic
  * aggregates, and the mean is derived from the exact-DECIMAL sum.
  * The classic window respelling (`first_value` over a partitioned
  * sort) materializes and sorts every event after its exchange; this
  * form reduces each (key, bucket) to one buffered row BEFORE the
  * shuffle, so a 100× event volume moves the same O(keys × buckets)
  * through the wire.
  *
  * Determinism: `tsCol` must be unique per key (or the caller accepts
  * Spark's/SQL's shared arg-extreme tie rule being engine-dependent —
  * the oracle fixture uses the unique-ts contract). Bucket alignment
  * uses `pmod` (floor semantics), so pre-epoch negative timestamps
  * still bucket toward −∞ — note plain SQL `%` truncates toward zero
  * and would disagree there; the oracle fixture is positive-time.
  */
object Resample {

  /** Per (keyCols, bucket of `bucketUs` µs): `n` events, `open`
    * (value at min ts), `close` (value at max ts), `high`, `low`,
    * exact 2dp `vsum` and 6dp `vmean`. `bucket_start` is the bucket's
    * inclusive lower edge in epoch µs.
    */
  def ohlc(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      bucketUs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "ohlc needs at least one key column")
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val v = col(valCol).cast("decimal(18,2)")
    val bucket = (col(tsCol) - pmod(col(tsCol), lit(bucketUs))).as("bucket_start")
    events
      .where(col(tsCol).isNotNull)
      .groupBy((keyCols.map(col) :+ bucket): _*)
      .agg(
        count(lit(1)).as("n"),
        min_by(v, col(tsCol)).as("open"),
        max_by(v, col(tsCol)).as("close"),
        max(v).as("high"),
        min(v).as("low"),
        sum(v).as("vsum"))
      .withColumn("vmean", exactMean6(col("vsum"), col("n")))
  }

  /** 6dp mean, INTEGER-EXACT (the [[Profile]]/[[Text.readability]]
    * recipe): sign-aware half-up integral division of the micro-scaled
    * exact-decimal sum — a double `round(sum/n, 6)` lands on
    * rounding-boundary quotients often enough to split engines by one
    * ulp. */
  private def exactMean6(
      sm: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
    val u = (sm * lit(1000000)).cast("decimal(38,0)")
    val micro = when(u >= 0, intDiv(u * 2 + n, n * 2))
      .otherwise(-intDiv((-u) * 2 + n, n * 2))
    micro.cast("double") / lit(1000000.0)
  }
}
