package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hard-negative mining scale-path measurement: brute-force broadcast
  * cross-score vs the IVF-bucketed form on a (scaled) embeddings
  * table — `runMain graft.tools.HardNegBench [sfDir] [k] [nLists] [nProbe]`.
  *
  * Prints one JSON line with wall times (median of 3) and recall@k of
  * the indexed form at nProbe and nProbe/2 against brute force. This is
  * the trade the indexed operator exists to make at corpus scale: the
  * label-inequality filter runs inside the probed cells only (the
  * q_ivf_topk plan shape), instead of scoring every (query, corpus)
  * pair.
  */
object HardNegBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 8
    val nLists = if (args.length > 2) args(2).toInt else 64
    val nProbe = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = corpus.count() // warm + size
    val queries = corpus.where(col("vec_id") < 50)

    def timeMedian(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    val tBrute = timeMedian(graft.ops.Similarity.hardNegatives(corpus, queries, k))

    val t0 = System.nanoTime()
    val (assigned, centroids) =
      graft.ops.Ivf.assignCells(corpus, nLists, sampleSize = 256 * nLists)
    val cached = assigned.persist()
    cached.count()
    val tBuild = (System.nanoTime() - t0) / 1e9

    val tIvf = timeMedian(
      graft.ops.Ivf.hardNegativesIndexed(cached, centroids, queries, k, nProbe))

    val exact = graft.ops.Similarity
      .hardNegatives(corpus, queries, k)
      .select("query_id", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    require(exact.nonEmpty,
      s"brute-force hard negatives returned no rows for $sfDir — recall undefined")
    def recallAt(np: Int): Double = {
      val approx = graft.ops.Ivf
        .hardNegativesIndexed(cached, centroids, queries, k, np)
        .select("query_id", "vec_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      (exact & approx).size.toDouble / exact.size
    }
    val recall = recallAt(nProbe)
    val recallHalf = recallAt(math.max(1, nProbe / 2))

    println(
      s"""{"hardneg":"bench","n":$n,"k":$k,"nLists":$nLists,"nProbe":$nProbe,""" +
        s""""brute_sec":$tBrute,"ivf_build_sec":$tBuild,"ivf_query_sec":$tIvf,""" +
        s""""recall":$recall,"recall_half_probe":$recallHalf,"sf":"$sfDir"}""")
    spark.stop()
  }
}
