package graft.tools
import org.apache.spark.sql.SparkSession
/** r18 sweep: per-query physical-plan join/exchange census at sf0.001. */
object R18JoinAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        val smj = c("SortMergeJoin")
        val ex = c("Exchange")
        if (smj > 0 || ex >= 8)
          println(f"JOINAUDIT smj=$smj%2d ex=$ex%3d bhj=${c("BroadcastHashJoin")}%2d  $n")
      } catch { case e: Throwable => System.err.println(s"[audit] $n: ${e.getMessage}") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
