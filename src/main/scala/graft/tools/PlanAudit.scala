package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for key queries so plan
  * regressions (lost pushdown, surprise shuffles, missed broadcasts) are
  * visible. Run: sbt "runMain graft.tools.PlanAudit [queryName ...]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing", "q3_revenue", "q_user_sessions", "q_sim_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
