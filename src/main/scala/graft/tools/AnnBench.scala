package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN scale-path measurement: brute-force cosine top-k vs IVF probing
  * on a (scaled) embeddings table —
  * `runMain graft.tools.AnnBench [sfDir] [k] [nLists] [nProbe]`.
  *
  * Prints one JSON line with wall times (median of 3) for the exact scan
  * and the IVF plan, plus IVF recall@k against the exact result. This is
  * the trade the IVF operator exists to make at corpus scale: probe
  * nProbe/nLists of the cells (one bucket equi-join) instead of scoring
  * every vector, surrendering bounded recall.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
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

    val tBrute = timeMedian(graft.ops.Similarity.bruteForceTopK(corpus, queries, k))

    // index build (ONCE per corpus — amortizes across query batches);
    // sample sized FAISS-style at ~256 points per centroid
    val t0 = System.nanoTime()
    val (assigned, centroids) =
      graft.ops.Ivf.assignCells(corpus, nLists, sampleSize = 256 * nLists)
    val cached = assigned.persist()
    cached.count()
    val tBuild = (System.nanoTime() - t0) / 1e9

    val tIvf = timeMedian(graft.ops.Ivf.topKIndexed(cached, centroids, queries, k, nProbe))

    // ON-DISK index layouts, same serving code: flat parquet scans the
    // whole index per query batch; cell-PARTITIONED parquet joins on cell
    // against the small broadcast probe side, so dynamic partition
    // pruning reads only the probed cells' files — the layout a 100 TB
    // index wants (nProbe/nLists of the I/O)
    val idxDir = java.nio.file.Files.createTempDirectory("annbench-idx-").toString
    cached.write.mode("overwrite").parquet(s"$idxDir/flat.parquet")
    cached.write.mode("overwrite").partitionBy("cell").parquet(s"$idxDir/assigned.parquet")
    centroids.write.mode("overwrite").parquet(s"$idxDir/centroids.parquet")
    val pCentroids = spark.read.parquet(s"$idxDir/centroids.parquet")
    val tServeFlat = timeMedian(graft.ops.Ivf.topKIndexed(
      spark.read.parquet(s"$idxDir/flat.parquet"), pCentroids, queries, k, nProbe))
    val pAssigned = spark.read.parquet(s"$idxDir/assigned.parquet")
    val servePlan = graft.ops.Ivf.topKIndexed(pAssigned, pCentroids, queries, k, nProbe)
    val tServePartitioned = timeMedian(servePlan)
    servePlan.collect() // populate THIS QueryExecution's scan metrics
    val executedServe = servePlan.queryExecution.executedPlan
    val dppActive = executedServe.toString.contains("dynamicpruning")
    // rows the index scan actually produced under DPP. NOTE the batch
    // effect: pruning keeps the UNION of the batch's probed cells, so a
    // 50-query batch probing 8/64 cells each covers nearly every cell —
    // the per-query I/O win shows on SMALL batches (the serving case),
    // so it is measured on a single query alongside the full batch
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    def idxRowsRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      helper
        .collectWithSubqueries(df.queryExecution.executedPlan) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains("assigned.parquet")) =>
            f.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        }
        .headOption.getOrElse(-1L)
    }
    val rowsBatch = idxRowsRead(
      graft.ops.Ivf.topKIndexed(pAssigned, pCentroids, queries, k, nProbe))
    val rowsSingle = idxRowsRead(
      graft.ops.Ivf.topKIndexed(
        pAssigned, pCentroids, corpus.where(col("vec_id") === 0), k, nProbe))

    val exact = graft.ops.Similarity
      .bruteForceTopK(corpus, queries, k)
      .select("query_id", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    require(exact.nonEmpty,
      s"brute-force top-$k returned no rows for $sfDir — recall undefined (empty/too-small embeddings table?)")
    def recallAt(np: Int): Double = {
      val approx = graft.ops.Ivf
        .topKIndexed(cached, centroids, queries, k, np)
        .select("query_id", "vec_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      (exact & approx).size.toDouble / exact.size
    }
    val recall = recallAt(nProbe)
    val recall2 = recallAt(nProbe * 2)

    println(
      s"""{"ann":"bench","n":$n,"k":$k,"nLists":$nLists,"nProbe":$nProbe,""" +
        s""""brute_sec":$tBrute,"ivf_build_sec":$tBuild,"ivf_query_sec":$tIvf,""" +
        s""""ivf_query_flat_parquet_sec":$tServeFlat,""" +
        s""""ivf_query_partitioned_sec":$tServePartitioned,"dpp_active":$dppActive,""" +
        s""""index_rows_read_batch50":$rowsBatch,"index_rows_read_single_query":$rowsSingle,"index_rows_total":$n,""" +
        s""""recall":$recall,"recall_2x_probe":$recall2,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
