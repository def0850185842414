package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 LM-family cost split (VERDICT r18 #6): where do
  * q_lm_bigram / q_lm_trigram / q_phrase_search / q_ccnet_buckets
  * spend their ~1.1–1.4 s — model build passes, scoring stream, or
  * driver gates — before deciding whether any exchange is shareable
  * without reordering float folds. */
object R19LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docs = graft.model.Tables.documents(spark, dir)

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"STAGE $label%-36s min ${ts.min}%.3f s  (med ${ts.sorted.apply(2)}%.3f)")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
    }

    time("docs scan")(noop(docs.select("doc_id", "text")))
    time("unigramCounts")(noop(graft.ops.Lm.unigramCounts(docs)))
    time("bigramGramCounts")(noop(graft.ops.Lm.bigramGramCounts(docs, 1)))
    time("trigram gram counts")(noop(
      graft.ops.Lm.trigramGrams(docs).groupBy("g").agg(count(lit(1)).as("c3"))))
    time("bigramScore full")({ noop(graft.ops.Lm.bigramScore(docs, 1)); clear() })
    time("trigramScore full")({ noop(graft.ops.Lm.trigramScore(docs, 1)); clear() })
    time("q_phrase_search full")({
      noop(graft.SparkEntry.queries("q_phrase_search")(spark, dir)); clear() })
    time("q_ccnet_buckets full")({
      noop(graft.SparkEntry.queries("q_ccnet_buckets")(spark, dir)); clear() })
    spark.stop()
  }
}
