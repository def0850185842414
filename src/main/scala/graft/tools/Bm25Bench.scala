package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BM25 build-vs-serve measurement (the AnnBench of the lexical stack):
  * `runMain graft.tools.Bm25Bench [sfDir] [k]`.
  *
  * Prints one JSON line with the one-shot scan-form query time, the
  * one-time postings-index build time, and the indexed probe time
  * (median of 3 each), plus a result-parity flag. This is the trade
  * [[graft.ops.Bm25.buildIndex]] exists to make at corpus scale: the
  * probe touches only the query terms' hash-bucket partitions of the
  * inverted index (static pruning; zero corpus tokenization), so its
  * cost is O(matched postings), independent of corpus text volume —
  * the scan form re-tokenizes the corpus per query batch.
  */
object Bm25Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count() // warm the scan
    val terms = Seq("scan", "join", "vector", "stream", "merge", "zzz")

    def timeMedian(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    val tScan = timeMedian(graft.ops.Bm25.topK(docs, terms, k))

    val idxDir = java.nio.file.Files.createTempDirectory("bm25bench-idx-").toString
    val t0 = System.nanoTime()
    graft.ops.Bm25.buildIndex(docs, idxDir, nBuckets = 64)
    val tBuild = (System.nanoTime() - t0) / 1e9

    val tServe = timeMedian(graft.ops.Bm25.topKIndexed(spark, idxDir, terms, k))

    val scanRows = graft.ops.Bm25.topK(docs, terms, k).collect().toSeq
    val serveRows = graft.ops.Bm25.topKIndexed(spark, idxDir, terms, k).collect().toSeq
    val parity = scanRows == serveRows

    val postingsRows = spark.read.parquet(s"$idxDir/postings").count()
    println(
      s"""{"metric":"bm25_build_serve","sfDir":"$sfDir","n_docs":$nDocs,""" +
        s""""postings_rows":$postingsRows,"k":$k,""" +
        s""""scan_sec":$tScan,"build_sec":$tBuild,"serve_sec":$tServe,""" +
        s""""parity":$parity}""")
    spark.stop()
  }
}
