package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-gap linear interpolation (J4/F1/F9, jagular/utils.py:459-528):
  * for each missing integral timestamp inside a gap of at most
  * `maxGapSize` steps, synthesize a row whose value is the 2-point linear
  * interpolation between the bracketing samples
  * (`interp1d` on the two neighbors, jagular/utils.py:514-519). Gaps
  * larger than `maxGapSize` are left alone (they become epoch boundaries
  * via [[Sessionize]]).
  *
  * Expressed entirely with `lead` + `explode(sequence(...))` + closed-form
  * arithmetic — no UDF, no driver loop, stays in whole-stage codegen. The
  * reference's special "gap straddles a block boundary" state machine
  * (jagular/utils.py:461-474) disappears: Spark's window sees the true
  * neighbor regardless of physical batching.
  *
  * Scale: the window needs ordering; pass `keys` (channel id etc.) so it
  * partitions by key. For the keyless case this inherits the same caveat
  * as any global window — use a key at scale.
  */
object GapFill {

  /** @param tsCol    integral timestamp column (Long)
    * @param valueCol value column (numeric, interpolated as double)
    * @param step     timestamp increment between consecutive samples
    * @param maxGapSize max missing-sample run length that still gets filled
    * @param keys     partition keys (e.g. channel); empty = global stream
    * @return         original rows (`interpolated = 0`) unioned with
    *                 synthesized rows (`interpolated = 1`)
    */
  def linear(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      step: Long,
      maxGapSize: Long,
      keys: Seq[String] = Nil
  ): DataFrame = {
    val keyCols = keys.map(col)
    // keyed: one shuffle on the key. keyless: the two-pass OrderedStream
    // neighbor exchange — NOT a keyless window, which would serialize
    // into a single task at scale.
    val base =
      if (keys.isEmpty)
        OrderedStream
          .withNeighbors(df, tsCol, Seq(valueCol))
          .withColumnRenamed(s"__next_$tsCol", "__nts")
          .withColumnRenamed(s"__next_$valueCol", "__nv")
          .drop(s"__prev_$tsCol", s"__prev_$valueCol")
      else {
        val w = Window.partitionBy(keyCols: _*).orderBy(col(tsCol))
        df.withColumn("__nts", lead(col(tsCol), 1).over(w))
          .withColumn("__nv", lead(col(valueCol), 1).over(w))
      }

    // Off-grid gaps (length not a multiple of step) still get every
    // on-grid fill point strictly inside the gap: the sequence stop is
    // clamped to the largest ts + k*step < __nts, i.e.
    // ts + (g-1) - ((g-1) mod step) with g = __nts - ts. Since the gap
    // filter guarantees g > step, the clamped stop is always >= ts + step,
    // so sequence() can never see start > stop (the only failure mode the
    // old all-or-nothing `% step === 0` guard was protecting against —
    // at the cost of wrongly dropping partial fills like step=2, 4→9
    // losing t∈{6,8}).
    val gapLen = col("__nts") - col(tsCol)
    val gapped = base
      .where(
        col("__nts").isNotNull &&
          (gapLen > step) &&
          (gapLen <= lit(maxGapSize) * lit(step) + lit(step))
      )
      .withColumn(
        "__gstop",
        col(tsCol) + (gapLen - 1) - pmod(gapLen - 1, lit(step))
      )
      .withColumn("__gts", explode(sequence(col(tsCol) + step, col("__gstop"), lit(step))))
      // v0 + (t - t0) * (v1 - v0) / (t1 - t0), evaluated in double.
      .withColumn(
        "__gv",
        col(valueCol) + (col("__gts") - col(tsCol)).cast("double") *
          (col("__nv") - col(valueCol)) / (col("__nts") - col(tsCol)).cast("double")
      )

    val synth = gapped.select(
      keyCols ++ Seq(
        col("__gts").as(tsCol),
        col("__gv").cast(df.schema(valueCol).dataType).as(valueCol),
        lit(1).as("interpolated")
      ): _*
    )
    val orig = df.select(
      keyCols ++ Seq(col(tsCol), col(valueCol), lit(0).as("interpolated")): _*
    )
    orig.unionByName(synth)
  }
}
