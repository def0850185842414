package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object R18EwmaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def ev = graft.model.Tables.events(spark, dir).select("event_id", "user_id", "ts_us", "value")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $label%-28s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    ev.write.format("noop").mode("overwrite").save()
    time("scan noop")(ev.write.format("noop").mode("overwrite").save())
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    time("window row_number only")(
      ev.withColumn("r", row_number().over(w)).write.format("noop").mode("overwrite").save())
    time("window 17 lags raw")(
      (1 to 17).foldLeft(ev.withColumn("c", col("value").cast("decimal(18,2)")))(
        (d, k) => d.withColumn(s"l$k", lag(col("c"), k).over(w)))
        .write.format("noop").mode("overwrite").save())
    time("full controlChart")(
      graft.ts.Ewma.controlChart(ev, Seq("user_id"), "ts_us", "event_id", "value",
        taps = 8, alphaNum = 1, alphaDen = 4, thresholdMicro = 200000000L)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
