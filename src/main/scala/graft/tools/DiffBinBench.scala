package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1× vs 100× scale-shape rows for the two round-14 operators the
  * COVERAGE table was missing: [[graft.ops.Changelog.snapshotDiff]]
  * and [[graft.ops.Features.quantileBin]] —
  * `runMain graft.tools.DiffBinBench <sfDir> <scaleDir>`.
  *
  * The oracle fixtures read orders/lineitem, which ScaleGen doesn't
  * scale, so this probe re-keys the SAME operator shapes onto the
  * scaled events table: snapshotDiff over two event-keyed snapshots
  * (full-outer equi-join, payload compare), quantileBin over the
  * events value column (tiny two-pass histogram rollup + one
  * broadcast-edge bin projection). Warmed median-of-3 each.
  */
object DiffBinBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DiffBinBench <sfDir> <scaleDir>")
    val Array(sfDir, scaleDir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def events(dir: String): DataFrame =
      graft.model.Tables.events(spark, dir).select("event_id", "ts_us", "value", "event_type")

    def snapshotDiffOf(dir: String): DataFrame = {
      val ev = events(dir)
      val v = col("value").cast("decimal(18,2)")
      val old = ev.where(col("event_id") % 10 =!= 0)
        .select(col("event_id"), v.as("price"), col("event_type").as("status"))
      val neu = ev.where(col("event_id") % 7 =!= 0)
        .select(col("event_id"),
          (v + when(col("event_id") % 5 === 0, 1).otherwise(0)).as("price"),
          col("event_type").as("status"))
      graft.ops.Changelog.snapshotDiff(old, neu, Seq("event_id"))
    }

    def quantileBinOf(dir: String): DataFrame =
      graft.ops.Features.quantileBin(
        events(dir).select(col("event_id"), col("value").cast("double").as("v")),
        "v", nBins = 4)

    def bench(label: String, mk: () => DataFrame): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = mk()
        df.write.format("noop").mode("overwrite").save()
        val n = mk().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm
      val runs = (1 to 3).map(_ => once())
      val med = runs.map(_._1).sorted.apply(1)
      println(f"""{"metric":"diffbin","case":"$label","t_median":$med%.3f,"rows":${runs.head._2}}""")
    }

    bench("snapshot_diff_1x", () => snapshotDiffOf(sfDir))
    bench("snapshot_diff_100x", () => snapshotDiffOf(scaleDir))
    bench("quantile_bin_1x", () => quantileBinOf(sfDir))
    bench("quantile_bin_100x", () => quantileBinOf(scaleDir))

    // r15: Bloom screen at 100× — the big (probe) side is the scaled
    // events table; the filter keys are the signup users (bounded
    // small side), the same m/k as q_bloom_screen
    def bloomOf(dir: String): DataFrame = {
      val ev = events(dir)
      val small = ev.where(col("event_type") === "signup").select(col("event_id"))
      graft.ops.Bloom.screen(ev, "event_id", small, "event_id", m = 1 << 16, k = 3)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }
    bench("bloom_screen_1x", () => bloomOf(sfDir))
    bench("bloom_screen_100x", () => bloomOf(scaleDir))

    // r15: item-pair co-occurrence at 100× — ~12-item synthetic baskets
    // over the scaled events (the oracle fixture reads lineitem, which
    // ScaleGen doesn't scale); same distinct + window-size + self-join
    // + rollup shape
    def pairsOf(dir: String): DataFrame = {
      val ev = events(dir)
      graft.ops.Itemsets.coOccurrence(
        ev.select(
          (col("event_id") - pmod(col("event_id"), lit(12L))).as("basket"),
          concat(lit("i"), pmod(col("value").cast("long"), lit(50L)).cast("string")).as("item")),
        "basket", "item", minSupport = 3L, maxBasketSize = 20)
    }
    bench("item_pairs_1x", () => pairsOf(sfDir))
    bench("item_pairs_100x", () => pairsOf(scaleDir))

    // r15: winsorize at 100× — p05/p95 clamp over the scaled events
    // value column (two bounded estimator passes + stateless clamp)
    def winsorOf(dir: String): DataFrame =
      graft.ops.Features.winsorize(
        events(dir).select(col("event_id"), col("value").cast("double").as("v")),
        "v", 0.05, 0.95)
        .where(col("event_id") % 997 === 0)
    bench("winsorize_1x", () => winsorOf(sfDir))
    bench("winsorize_100x", () => winsorOf(scaleDir))
    spark.stop()
  }
}
