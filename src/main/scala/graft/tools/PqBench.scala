package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ serving measurement on a (scaled) embeddings table:
  * `runMain graft.tools.PqBench [sfDir] [k] [m] [ksub]`.
  *
  * Reports the trade product quantization exists to make: the codes
  * table's compression vs the float vectors, ADC-only top-k time and
  * recall vs exact L2, and the shortlist+rerank recall ladder (the
  * production shape — rerank depth buys back what quantization blurred).
  * Codes are served from PARQUET (written once like a real deployment);
  * exact L2 scans the full vector table.
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val m = if (args.length > 2) args(2).toInt else 8
    val ksub = if (args.length > 3) args(3).toInt else 256
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

    val tExact = timeMedian(graft.ops.Pq.l2TopK(corpus, queries, k))

    val t0 = System.nanoTime()
    val cb = graft.ops.Pq.train(corpus, m, ksub, sampleSize = 100000, iters = 8)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val dir = java.nio.file.Files.createTempDirectory("pqbench-").toString
    val t1 = System.nanoTime()
    graft.ops.Pq.encode(corpus, cb)
      .select("vec_id", "code")
      .write.mode("overwrite").parquet(s"$dir/codes.parquet")
    val tEncode = (System.nanoTime() - t1) / 1e9
    val codes = spark.read.parquet(s"$dir/codes.parquet")

    def sizeOf(p: String): Long = {
      val f = new java.io.File(p)
      Option(f.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
    }
    def sizeOfTree(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val rawBytes = sizeOf(s"$sfDir/embeddings.parquet") match {
      case 0L => new java.io.File(s"$sfDir/embeddings.parquet").length()
      case s => s
    }
    val codeBytes = sizeOf(s"$dir/codes.parquet")

    val tAdc = timeMedian(graft.ops.Pq.adcTopK(codes, queries, cb, k))
    val tRerank4 = timeMedian(graft.ops.Pq.adcTopKReranked(codes, corpus, queries, cb, k, rerank = 4))

    val exact = graft.ops.Pq.l2TopK(corpus, queries, k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(exact.nonEmpty, s"exact L2 top-$k empty for $sfDir")
    def recallOf(df: DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val rAdc = recallOf(graft.ops.Pq.adcTopK(codes, queries, cb, k))
    val rR2 = recallOf(graft.ops.Pq.adcTopKReranked(codes, corpus, queries, cb, k, rerank = 2))
    val rR4 = recallOf(graft.ops.Pq.adcTopKReranked(codes, corpus, queries, cb, k, rerank = 4))
    val rR8 = recallOf(graft.ops.Pq.adcTopKReranked(codes, corpus, queries, cb, k, rerank = 8))

    // IVF-PQ: coarse cells + residual codes, served from a
    // cell-PARTITIONED parquet index (the probed-cell pruning layout)
    val nLists = 64
    val nProbe = 8
    val t2 = System.nanoTime()
    val cents = graft.ops.Ivf.trainCentroids(corpus, nLists, sampleSize = 256 * nLists)
    val cbRes = graft.ops.Pq.trainResidual(corpus, cents, m, ksub, sampleSize = 100000, iters = 8)
    graft.ops.Pq.encodeIvfPq(corpus, cents, cbRes)
      .select("vec_id", "cell", "code")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/ivfpq.parquet")
    val tIvfPqBuild = (System.nanoTime() - t2) / 1e9
    val ivfpqIdx = spark.read.parquet(s"$dir/ivfpq.parquet")
    def ivfpq(np: Int, rr: Int) =
      graft.ops.Pq.ivfPqTopK(ivfpqIdx, corpus, queries, cents, cbRes, k, np, rr)
    val tIvfPq = timeMedian(ivfpq(nProbe, 4))
    val rIvfPq4 = recallOf(ivfpq(nProbe, 4))
    val rIvfPq8 = recallOf(ivfpq(nProbe, 8))
    val rIvfPq2x = recallOf(ivfpq(nProbe * 2, 8))
    val rIvfPq32 = recallOf(ivfpq(nProbe, 32))
    val ivfpqBytes = sizeOfTree(s"$dir/ivfpq.parquet")

    println(
      s"""{"pq":"bench","n":$n,"k":$k,"m":$m,"ksub":$ksub,""" +
        s""""exact_sec":$tExact,"train_sec":$tTrain,"encode_sec":$tEncode,""" +
        s""""adc_sec":$tAdc,"rerank4_sec":$tRerank4,""" +
        s""""raw_parquet_bytes":$rawBytes,"codes_parquet_bytes":$codeBytes,""" +
        f""""recall_adc":$rAdc%.3f,"recall_rerank2":$rR2%.3f,"recall_rerank4":$rR4%.3f,"recall_rerank8":$rR8%.3f,""" +
        s""""ivfpq_nlists":$nLists,"ivfpq_nprobe":$nProbe,"ivfpq_build_sec":$tIvfPqBuild,""" +
        s""""ivfpq_query_sec":$tIvfPq,"ivfpq_index_bytes":$ivfpqBytes,""" +
        f""""recall_ivfpq_rerank4":$rIvfPq4%.3f,"recall_ivfpq_rerank8":$rIvfPq8%.3f,"recall_ivfpq_2xprobe_rerank8":$rIvfPq2x%.3f,"recall_ivfpq_rerank32":$rIvfPq32%.3f,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
