package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the channel-store layout trade [[graft.ops.ZOrder
  * .writeClustered]] offers ([[graft.io.ExtractChannels.extractTo]]'s
  * `zorderFiles` option): rows MATERIALIZED by the parquet reader
  * (row-group min/max pruning) and files written, for the same
  * channel-sample table under a (channel-range × ts-range) box
  * predicate — the patch/epoch gather every spike pipeline runs —
  * across three layouts:
  *
  *  - `partitioned`: directory per channel, ts-sorted within (the S8
  *    interchange default) — exact channel pruning, |channels| dirs;
  *  - `flat_ts`: ts-range-partitioned flat files (a log table's
  *    natural layout) — prunes ts only, every channel read;
  *  - `z`: flat z-clustered on (channel, ts) in the same file count —
  *    prunes BOTH dims from row-group stats, no per-key directories.
  *
  * `runMain graft.tools.ChannelZOrderBench [nChannels] [nTs] [files]`
  */
object ChannelZOrderBench {
  def main(args: Array[String]): Unit = {
    val nCh = if (args.length > 0) args(0).toInt else 64
    val nTs = if (args.length > 1) args(1).toLong else 250000L
    val files = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // long-layout channel samples, the extract() output shape
    val samples = spark.range(nCh * nTs).select(
      (col("id") % nCh).cast("int").as("channel"),
      (col("id") / nCh).as("ts"),
      ((col("id") * 2654435761L) % 2000 - 1000).cast("short").as("value"))

    val dir = java.nio.file.Files.createTempDirectory("chz-bench-").toString
    samples
      .repartition(col("channel")).sortWithinPartitions("channel", "ts")
      .write.mode("overwrite").partitionBy("channel").parquet(s"$dir/partitioned")
    samples
      .repartitionByRange(files, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/flat_ts")
    graft.ops.ZOrder.writeClustered(samples, s"$dir/z", Seq("channel", "ts"), bits = 16, files)

    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    // 4/64 of channels × 1/16 of ts per box, five placements
    val offsets = Seq(1, 4, 7, 10, 13)
    def boxScan(path: String, k: Int): DataFrame = {
      val c0 = k * nCh / 16
      val t0 = k * nTs / 16
      spark.read.parquet(path).where(
        col("channel").between(c0, c0 + nCh / 16 - 1) &&
          col("ts").between(t0, t0 + nTs / 16 - 1))
    }
    def rowsRead(path: String, k: Int): Long = {
      val df = boxScan(path, k)
      df.collect()
      helper.collectWithSubqueries(df.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      }.headOption.getOrElse(-1L)
    }
    def nParquetFiles(path: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1
        else 0
      walk(new java.io.File(path))
    }

    val boxRows = offsets.map(k => boxScan(s"$dir/flat_ts", k).count()).sum / offsets.size
    val layouts = Seq("partitioned", "flat_ts", "z")
    val read = layouts.map(l => l -> offsets.map(k => rowsRead(s"$dir/$l", k)).sum / offsets.size).toMap
    val nf = layouts.map(l => l -> nParquetFiles(s"$dir/$l")).toMap
    println(
      s"""{"bench":"channel_zorder","total_rows":${nCh * nTs},"avg_box_rows":$boxRows,""" +
        layouts.map(l => s""""rows_read_$l":${read(l)},"files_$l":${nf(l)}""").mkString(",") +
        "}")
    spark.stop()
  }
}
