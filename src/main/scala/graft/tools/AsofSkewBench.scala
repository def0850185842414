package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** Single-hot-key skew measurement for the batch as-of join: ALL rows
  * share one key, the worst case for [[AsOf.asofBackward]] (its window
  * partitions on the key, so the whole dataset serializes into one
  * task) and the shape [[AsOf.asofBackwardBucketed]] exists for (the
  * hot key fans out across time epochs). Reports wall seconds for both
  * forms at the given row count plus a row-count cross-check (the two
  * must agree — parity is additionally spec-pinned in AsOfSpec).
  *
  * `runMain graft.tools.AsofSkewBench [nLeft] [nRight] [repeats]`
  */
object AsofSkewBench {
  def main(args: Array[String]): Unit = {
    val nLeft = if (args.length > 0) args(0).toInt else 2000000
    val nRight = if (args.length > 1) args(1).toInt else 2000000
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one key; left probes at odd times, right updates at even times
    val left = spark.range(nLeft).select(
      lit(1L).as("k"), (col("id") * 2 + 1).as("t"), col("id").as("probe_id"))
    val right = spark.range(nRight).select(
      lit(1L).as("k"), (col("id") * 2).as("t"), (col("id") % 1000).cast("double").as("v"))
    // epoch width: ~1000 epochs over the hot key's time range
    val width = math.max(1L, 2L * math.max(nLeft, nRight) / 1000L)

    def time(label: String, df: => DataFrame): Double = {
      val runs = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        // aggregate OVER THE PAYLOAD — a bare count() lets Catalyst
        // prune the as-of window away entirely (the carried column is
        // never referenced) and times only the union scan
        val r = df.agg(count(lit(1)).as("n"), sum("v").as("s")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[asof-skew] $label%-10s rows=${r.getLong(0)} sum=${r.getDouble(1)}%.1f sec=$sec%.2f")
        sec
      }
      runs.min
    }

    val plain = time("window", AsOf.asofBackward(left, right, Seq("k"), "t", Seq("v")))
    val bucketed = time("bucketed",
      AsOf.asofBackwardBucketed(left, right, Seq("k"), "t", Seq("v"), bucketWidth = width))
    println(f"""{"metric":"asof_skew_1key","n_left":$nLeft,"n_right":$nRight,""" +
      f""""window_sec":$plain%.2f,"bucketed_sec":$bucketed%.2f,""" +
      f""""speedup":${plain / bucketed}%.2f}""")
    spark.stop()
  }
}
