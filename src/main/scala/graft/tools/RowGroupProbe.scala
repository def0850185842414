package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Converts COVERAGE.md's q1 "single-row-group floor" explanation from
  * assertion to measurement —
  * `runMain graft.tools.RowGroupProbe [sfDir]`.
  *
  * The sf0.1 lineitem is ONE parquet file with ONE row group, so the
  * whole-stage-codegen'd scan+partial-agg of q1_pricing is a single task
  * by construction: its bench time is a layout floor, not a plan cost.
  * This probe rewrites the same 600k rows as a multi-row-group file and
  * re-runs the IDENTICAL query with `spark.sql.files.maxPartitionBytes`
  * sized to one row group, so the scan stage fans out the way any
  * real-scale (multi-row-group, multi-file) table does. Prints one JSON
  * line per layout with wall time (median of 3, warmed) and the task
  * count of the heaviest stage.
  */
object RowGroupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    // multi-row-group rewrite: same rows, ~340 KiB row groups (~32 per
    // file); other tables aren't read by q1 so only lineitem is written
    val rgDir = java.nio.file.Files.createTempDirectory("graft-rg-").toString
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .coalesce(1)
      .write.option("parquet.block.size", (340 * 1024).toString)
      .mode("overwrite").parquet(s"$rgDir/lineitem.parquet")

    def run(dir: String, maxPartitionBytes: String, label: String): Unit = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      def once(): (Double, Long) = {
        // settle the listener queue so task counts attribute to this run
        Thread.sleep(300)
        tasks.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q1_pricing")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (dt, tasks.get())
      }
      once() // warm
      val runs = (1 to 3).map(_ => once())
      val med = runs.map(_._1).sorted.apply(1)
      println(
        f"""{"metric":"q1_rowgroups","layout":"$label","maxPartitionBytes":"$maxPartitionBytes","t_median":$med%.3f,"tasks":${runs.last._2}}""")
    }

    run(sfDir, "128m", "single-row-group (shipped sf0.1)")
    run(rgDir, "128m", "multi-row-group, default splits")
    run(rgDir, "350k", "multi-row-group, split-per-row-group")
    spark.stop()
  }
}
