package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object R18TfidfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def docs = graft.model.Tables.documents(spark, dir).select("doc_id", "text")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache(); graft.util.CacheRegistry.releaseAll()
        (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $label%-28s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    docs.write.format("noop").mode("overwrite").save()
    time("shipped keywordsTfIdf")(
      graft.ops.Text.keywordsTfIdf(docs, 5).write.format("noop").mode("overwrite").save())
    def lazyVariant(persistTf: Boolean): Unit = {
      val nDocs = docs.count()
      val toks = docs.select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)).as("token"))
      val tf0 = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val tf = if (persistTf) graft.util.CacheRegistry.track(
        tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)) else tf0
      val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token").asc)
      tf.join(dfT, "token")
        .withColumn("score", round(col("tf") * log(lit(1.0) + lit(nDocs.toDouble) / col("df")), 4))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("doc_id", "token", "tf", "df", "score", "rank")
        .write.format("noop").mode("overwrite").save()
    }
    time("lazy + persist tf")(lazyVariant(true))
    time("lazy + reuse exchange")(lazyVariant(false))
    spark.stop()
  }
}
