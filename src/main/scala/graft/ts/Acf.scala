package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key sample autocorrelation at lags 1..maxLag — the
  * periodicity/persistence screen over per-entity metric series
  * (session cadence, sensor drift, activity seasonality) that decides
  * whether a series needs differencing before CUSUM/forecast-style
  * monitors trust it.
  *
  * Standard biased ACF estimator:
  * `r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²`
  * over the key's series in `tsCol` order.
  *
  * Execution shape: ONE key-partitioned window pass (mean + the k
  * lead columns ride the same sort) feeding one same-key rollup —
  * Catalyst reuses the window's hash partitioning for the groupBy, so
  * the whole operator is a single exchange; state is O(maxLag) per
  * row, output one row per (key, lag).
  *
  * Determinism contract (the oracle replays it term for term): values
  * read at 2dp DECIMAL; x̄ = round(cast(Σv as double)/n, 6); per-term
  * products rounded 12dp and summed as DECIMAL (partition-order-free);
  * the final ratio is a double division of the two exact sums, rounded
  * 6dp. NULL `acf` when the key has ≤ k points or zero variance.
  * Ordering ties on `tsCol` within a key are the caller's to exclude
  * (the events contract: per-key-unique timestamps).
  */
object Acf {

  def acf(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      maxLag: Int
  ): DataFrame = {
    require(keyCols.nonEmpty, "acf needs at least one key column")
    require(maxLag >= 1 && maxLag <= 32, s"maxLag must be in [1, 32], got $maxLag")
    val key = keyCols.map(col)
    val wk = Window.partitionBy(key: _*)
    val wo = wk.orderBy(col(tsCol))
    val v = col(valCol).cast("decimal(18,2)")
    val mean = round(
      sum(v).over(wk).cast("double") / count(v).over(wk).cast("double"), 6)
    val withDev = df
      .where(col(valCol).isNotNull)
      .withColumn("__dev", v.cast("double") - mean)
    val leads = (1 to maxLag).map(k => lead(col("__dev"), k).over(wo).as(s"__dev_$k"))
    val staged = withDev.select(key ++ Seq(col("__dev")) ++ leads: _*)
    def term(a: Column, b: Column): Column =
      round(a * b, 12).cast("decimal(38,12)")
    val aggs =
      Seq(
        count(lit(1)).as("n"),
        sum(term(col("__dev"), col("__dev"))).as("__den")) ++
        (1 to maxLag).flatMap { k =>
          Seq(
            count(col(s"__dev_$k")).as(s"__np_$k"),
            sum(when(col(s"__dev_$k").isNotNull,
              term(col("__dev"), col(s"__dev_$k")))).as(s"__num_$k"))
        }
    val rolled = staged.groupBy(key: _*).agg(aggs.head, aggs.tail: _*)
    val lagStructs = array((1 to maxLag).map { k =>
      struct(
        lit(k).as("lag"),
        col(s"__np_$k").as("n_pairs"),
        when(col(s"__np_$k") > 0 && col("__den") =!= 0,
          round(col(s"__num_$k").cast("double") / col("__den").cast("double"), 6))
          .as("acf"))
    }: _*)
    rolled
      .select(key ++ Seq(col("n"), explode(lagStructs).as("__l")): _*)
      .select(key ++ Seq(col("n"), col("__l.lag"), col("__l.n_pairs"), col("__l.acf")): _*)
  }
}
