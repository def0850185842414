package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed cross-correlogram between the two interleaved channels of an
  * ordered stream — the lag-estimation primitive behind
  * electrode-pair alignment and spike-train cross-correlograms
  * (reference domain: jagular's multi-channel packets,
  * jagular/utils.py:392-549, where channel pairs share one timestamp
  * stream).
  *
  * Channels are the parity split of the per-key ordered stream
  * (x = even positions, y = odd — the layout of an interleaved
  * 2-channel recording). For every lag l in [-maxLag, maxLag]:
  *
  *   r(l) = Σ_i x[i] · y[i+l]
  *
  * The trick that keeps this ONE exchange: from an x row at stream
  * position 2i, y[i+l] sits at position 2i + (2l+1) — so every lag is
  * a `lead(value, 2l+1)` over the SAME key-ordered window (negative
  * offsets are leads backwards), and the whole correlogram rides the
  * single per-key sort. No self-join, no second shuffle; the rollup
  * output is |keys| × (2·maxLag+1) rows.
  *
  * Exactness: values are read at 2dp DECIMAL, products are exact 4dp,
  * sums exact — the shipped `r` is one decimal→double cast, ranked
  * after 6dp rounding with lag tie-break, so engines cannot drift.
  */
object Xcorr {

  def correlogram(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String,
      maxLag: Int
  ): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val key = keyCols.map(col)
    val byKey = Window.partitionBy(key: _*).orderBy(col(tsCol).asc, col(tieCol).asc)
    val v = col(valueCol).cast("decimal(18,2)")
    val lags = -maxLag to maxLag
    // all lag leads ride the one ordered window; offset 2l+1 lands on
    // the y channel by parity
    val leadCols: Seq[Column] = lags.map { l =>
      val off = 2 * l + 1
      val shifted = if (off >= 0) lead(v, off) else lag(v, -off)
      shifted.over(byKey).as(s"__y_$l")
    }
    val staged = df.select(
      key ++ Seq(v.as("__x"), row_number().over(byKey).as("__rn")) ++ leadCols: _*)
    // x rows anchor: even stream positions (row_number is 1-based)
    val xRows = staged.where((col("__rn") % 2) === 1)
    val aggs = lags.flatMap { l =>
      Seq(
        sum(col("__x") * col(s"__y_$l")).as(s"__r_$l"),
        count(col(s"__y_$l")).as(s"__n_$l"))
    }
    val wide = xRows.groupBy(key: _*).agg(aggs.head, aggs.tail: _*)
    // unpivot the bounded wide frame to (key, lag, r, n_terms)
    val stacked = wide.select(
      key :+ explode(array(lags.map { l =>
        struct(
          lit(l).as("lag"),
          col(s"__r_$l").cast("double").as("r"),
          col(s"__n_$l").as("n_terms"))
      }: _*)).as("__e"): _*)
      .select(key ++ Seq(col("__e.lag"), col("__e.r"), col("__e.n_terms")): _*)
    val rank = Window
      .partitionBy(key: _*)
      .orderBy(col("r").desc_nulls_last, col("lag").asc)
    stacked.withColumn("rank", row_number().over(rank))
  }
}
