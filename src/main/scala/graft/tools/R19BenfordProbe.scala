package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 q_benford cost split: where does 1.3 s go for a 600 k-row
  * digit histogram — the scan, the decimal→cents cast, the
  * string-substring digit extraction, or the χ² tail — and does an
  * arithmetic when-chain digit beat the string form. */
object R19BenfordProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def li = graft.model.Tables.lineitem(spark, dir).select("l_extendedprice")

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"STAGE $label%-30s min ${ts.min}%.3f s  (med ${ts.sorted.apply(2)}%.3f)")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val cents = abs(col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    time("scan only")(noop(li))
    time("+cents cast")(noop(li.select(cents.as("__c"))))
    val base = li.select(cents.as("__c")).where(col("__c").isNotNull && col("__c") > 0L)
    time("+substring digit+groupBy")(noop(
      base.select(substring(col("__c").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)))))
    // arithmetic digit: when-chain over magnitude thresholds
    val d = col("__c")
    var expr = when(d < 10L, d)
    var p = 10L
    for (_ <- 1 to 17) {
      expr = expr.when(d < p * 10L, floor(d / p))
      p = if (p > Long.MaxValue / 10) p else p * 10L
    }
    time("+whenchain digit+groupBy")(noop(
      base.select(expr.otherwise(floor(d / 1000000000000000000L)).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)))))
    time("full benford")(noop(graft.ops.Stats.benford(li, "l_extendedprice")))
    spark.stop()
  }
}
