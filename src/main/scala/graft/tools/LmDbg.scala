package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object LmDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t00 = System.nanoTime()
    def now = f"${(System.nanoTime()-t00)/1e9}%8.2f"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println(s"[$now] job ${j.jobId} start")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        println(s"[$now] job ${j.jobId} end")
    })
    val docs = spark.read.parquet("/tmp/gscale/x100/documents.parquet")
    println(s"[$now] calling bigramScore")
    val out = graft.ops.Lm.bigramScore(docs, 2)
    println(s"[$now] plan built, writing")
    out.write.format("noop").mode("overwrite").save()
    println(s"[$now] done")
    spark.stop()
  }
}
