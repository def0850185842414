package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object R18PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm pass
    graft.SparkEntry.queries("q_pagerank")(spark, dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache(); graft.util.CacheRegistry.releaseAll()
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach(t0 => println(f"JOB ${j.jobId}%3d ${(System.nanoTime()-t0)/1e9}%7.3f s"))
    })
    // arc count probe
    val o = graft.model.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = graft.model.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val arcs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .agg(count(lit(1)).cast("double").as("w"))
    println("ARC PAIRS = " + arcs.count())
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_pagerank")(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"WARM TOTAL ${(System.nanoTime()-t0)/1e9}%.3f s")
    spark.stop()
  }
}
