package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 q_curate cost split (VERDICT r18 #5): cumulative stage
  * timings through the curation chain at bench conditions, plus the
  * packing tail isolated, so the 1.2 s goes to named stages instead of
  * "indirect". */
object R19CurateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docs = graft.model.Tables.documents(spark, dir)
    val isBench = col("source") === "src0"
    val cfg = graft.ops.Curation.Config(
      minStopwordRatio = 0.02, maxMeanWordLen = 5.0, maxDup2gramFrac = 0.15,
      weights = graft.SparkEntry.mixtureWeights, salt = "curate1")

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"STAGE $label%-32s min ${ts.min}%.3f s  (med ${ts.sorted.apply(2)}%.3f)")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    time("docs scan (all cols)")(noop(docs))
    val gated = docs.where(graft.ops.Curation.gatePredicate(cfg))
    time("+gate kernels")(noop(gated))
    val cleaned = graft.ops.Decontaminate.cleanAgainst(
      gated.where(!isBench), docs.where(isBench), cfg.decontaminateK, cfg.decontaminateMinOverlap)
    time("+decontaminate")(noop(cleaned))
    import org.apache.spark.sql.expressions.Window
    val byContent = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val deduped = cleaned.withColumn("__rn", row_number().over(byContent))
      .where(col("__rn") === 1).drop("__rn")
    time("+dedup window")(noop(deduped))
    val sampled = graft.ops.Mixture.sample(deduped, cfg.weights, cfg.salt)
    time("+mixture sample (=screen)")(noop(sampled))
    time("full curate (+pack)")(noop(
      graft.ops.Curation.curate(docs, isBench, cfg)
        .select("doc_id", "source", "n_tokens", "start_off", "seq_id", "seq_off")))
    spark.stop()
  }
}
