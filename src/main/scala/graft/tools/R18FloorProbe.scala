package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object R18FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $label%-34s min ${ts.min}%.3f s")
    }
    val docs = graft.model.Tables.documents(spark, dir)
    time("range(1) noop")(noop(spark.range(1).toDF("id")))
    time("documents full noop")(noop(docs))
    time("documents text-only noop")(noop(docs.select("text")))
    time("docs lower+split+explode count")(noop(docs.select(explode(split(lower(col("text")), "\\s+")).as("t")).groupBy("t").agg(count(lit(1)))))
    time("events noop")(noop(graft.model.Tables.events(spark, dir)))
    time("lineitem noop")(noop(graft.model.Tables.lineitem(spark, dir)))
    time("lineitem groupBy agg")(noop(graft.model.Tables.lineitem(spark, dir).groupBy("l_returnflag").agg(sum("l_quantity"))))
    time("q_gopher")(noop(graft.SparkEntry.queries("q_gopher")(spark, dir)))
    time("q_readability")(noop(graft.SparkEntry.queries("q_readability")(spark, dir)))
    time("q_normalize")(noop(graft.SparkEntry.queries("q_normalize")(spark, dir)))
    spark.stop()
  }
}
