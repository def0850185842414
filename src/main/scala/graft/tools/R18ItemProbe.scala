package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object R18ItemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def base = graft.model.Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("basket"),
      concat(lit("p"), (col("l_partkey") % 200).cast("string")).as("item"))
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $label%-30s min ${ts.min}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("base scan")(noop(base))
    val raw = base
      .where(col("basket").isNotNull && col("item").isNotNull)
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("__arr"))
      .where(size(col("__arr")) <= 20 && size(col("__arr")) >= 2)
    time("basket collect_set agg")(noop(raw))
    val pairs = flatten(transform(col("__arr"), (x, i) =>
      transform(slice(col("__arr"), i + 2, lit(20)), y => struct(x.as("a"), y.as("b")))))
    time("+pair explode+rollup")(noop(raw
      .select(explode(pairs).as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("n_baskets")).where(col("n_baskets") >= 5)))
    time("full coOccurrence")(noop(graft.ops.Itemsets.coOccurrence(base, "basket", "item", 5L, 20)))
    time("full rules")(noop(graft.ops.Itemsets.rules(base, "basket", "item", 5L, 20)))
    spark.stop()
  }
}
