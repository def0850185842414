package graft.tools
import org.apache.spark.sql.SparkSession
object R18NoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String, n: Int = 20)(f: => Unit): Unit = {
      f
      val ts = (1 to n).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $label%-34s min ${ts.min}%.3f  med ${ts.sorted.apply(n/2)}%.3f s")
    }
    time("plan only")({ val df = spark.range(1).toDF("id"); df.queryExecution.executedPlan })
    time("count()")(spark.range(1).toDF("id").count())
    time("rdd job (parallelize count)")(spark.sparkContext.parallelize(Seq(1,2,3), 1).count())
    time("noop save")(spark.range(1).toDF("id").write.format("noop").mode("overwrite").save())
    time("noop save 32-part")(spark.range(0, 1000, 1, 32).toDF("id").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
