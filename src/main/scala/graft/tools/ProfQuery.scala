package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiling aid: run one SparkEntry query with per-job wall times.
  * `runMain graft.tools.ProfQuery <queryName> [sfDir]` */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(), j.properties.getProperty("spark.job.description", ""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, desc) =>
          println(f"JOB ${j.jobId}%3d  ${(System.nanoTime() - t0) / 1e9}%8.3fs  ${desc.take(100)}")
        }
    })
    // warm
    graft.model.Tables.events(spark, sfDir).limit(1).count()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3fs ($name)")
    spark.stop()
  }
}
