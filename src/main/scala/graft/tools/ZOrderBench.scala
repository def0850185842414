package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure what the z-order layout actually buys: rows MATERIALIZED by
  * the parquet reader (row-group stats pruning) under a 2-D box
  * predicate `user_id ∈ [u0,u1] AND ts_us ∈ [t0,t1]`, on the same
  * events table written two ways — time-sorted (the layout a log table
  * naturally has; prunes ts, cannot prune user) and z-clustered on
  * (user_id, ts_us) ([[graft.ops.ZOrder.clusterByZ]]).
  *
  * `runMain graft.tools.ZOrderBench [sfDir] [bits] [files] [copies]`
  *
  * Each box covers 1/16 of each dimension (1/256 of the plane). A
  * perfect pruner reads ~total/256; the time-sorted layout is stuck at
  * ~total/16 (every user in the time window). `copies > 1` scales the
  * table by stacking ts-SHIFTED copies (same user base over a longer
  * span — the natural log-table growth shape, and the independence a
  * 2-D layout question needs; ScaleGen's copies shift user_id AND ts
  * together, a diagonal on which no layout can beat single-column
  * pruning).
  */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val bits = if (args.length > 1) args(1).toInt else 16
    val files = if (args.length > 2) args(2).toInt else 64
    val copies = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.model.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_us", "event_type", "value")
    val ev =
      if (copies == 1) base
      else {
        val s = base.agg(min("ts_us"), max("ts_us"), max("event_id")).head()
        val span = s.getLong(1) - s.getLong(0) + 1L
        val maxEid = s.getLong(2) + 1L
        base
          .withColumn("c", explode(sequence(lit(0L), lit(copies - 1L))))
          .select(
            (col("event_id") + col("c") * maxEid).as("event_id"),
            col("user_id"),
            (col("ts_us") + col("c") * span).as("ts_us"),
            col("event_type"), col("value"))
      }
    val total = ev.count()
    val b = ev.agg(
      min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val (uMin, uMax, tMin, tMax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // five box placements (1/16 × 1/16 of the plane each), spread so the
    // average isn't dominated by one adversarial tile-boundary crossing
    val offsets = Seq(1, 4, 7, 10, 13)
    def box16(lo: Long, hi: Long, k: Int): (Long, Long) = {
      val w = (hi - lo) / 16
      (lo + k * w, lo + (k + 1) * w)
    }

    val dir = java.nio.file.Files.createTempDirectory("zorder-bench-").toString
    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f; (a, (System.nanoTime() - s) / 1e9)
    }
    val (_, tWriteLinear) = timed {
      ev.repartitionByRange(files, col("ts_us")).sortWithinPartitions("ts_us")
        .write.mode("overwrite").parquet(s"$dir/linear.parquet")
    }
    val (_, tWriteZ) = timed {
      graft.ops.ZOrder.clusterByZ(ev, Seq("user_id", "ts_us"), bits, files)
        .write.mode("overwrite").parquet(s"$dir/z.parquet")
    }

    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    def boxScan(path: String, k: Int): DataFrame = {
      val (bu0, bu1) = box16(uMin, uMax, k)
      val (bt0, bt1) = box16(tMin, tMax, k)
      spark.read.parquet(path).where(
        col("user_id").between(bu0, bu1) && col("ts_us").between(bt0, bt1))
    }
    // rows the parquet reader materialized (post row-group pruning,
    // pre Spark-side filter) — the I/O the layout saves
    def rowsRead(path: String, k: Int): Long = {
      val df = boxScan(path, k)
      df.collect()
      helper.collectWithSubqueries(df.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      }.headOption.getOrElse(-1L)
    }
    def timeMedian(path: String): Double = {
      val runs = (1 to 3).map { _ =>
        val t0n = System.nanoTime()
        offsets.foreach(k =>
          boxScan(path, k).write.format("noop").mode("overwrite").save())
        (System.nanoTime() - t0n) / 1e9
      }
      runs.sorted.apply(1) / offsets.size
    }
    val boxRows = offsets.map(k => boxScan(s"$dir/linear.parquet", k).count()).sum / offsets.size
    val readLinear = offsets.map(k => rowsRead(s"$dir/linear.parquet", k)).sum / offsets.size
    val readZ = offsets.map(k => rowsRead(s"$dir/z.parquet", k)).sum / offsets.size
    val tLinear = timeMedian(s"$dir/linear.parquet")
    val tZ = timeMedian(s"$dir/z.parquet")

    println(
      s"""{"zorder":"bench","total_rows":$total,"avg_box_rows":$boxRows,"files":$files,"bits":$bits,""" +
        s""""avg_rows_read_linear":$readLinear,"avg_rows_read_z":$readZ,""" +
        s""""scan_sec_linear":$tLinear,"scan_sec_z":$tZ,""" +
        s""""write_sec_linear":$tWriteLinear,"write_sec_z":$tWriteZ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
