package graft.tools
import org.apache.spark.sql.SparkSession
/** r18 sweep: count physical-plan window expressions (occurrences of
  * `windowspecdefinition`) per query at sf0.001 — repeated lag/lead
  * Column instances are NOT deduped by Catalyst, so a chain referencing
  * the same lag k times plans k frames (the q_ewma 243-frame bug). */
object R18WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      val r = try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val c = "windowspecdefinition".r.findAllIn(plan).length
        if (c > 0) Some((n, c)) else None
      } catch { case e: Throwable => System.err.println(s"[audit] $n: ${e.getMessage}"); None }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
      r
    }
    out.sortBy(-_._2).foreach { case (n, c) => println(f"WINAUDIT $c%5d  $n") }
    spark.stop()
  }
}
