package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scale-shape measurement, BOTH axes the scaladoc claims
  * (`ops/SemDedup.scala`): at fixed `nLists` the per-cell pair count —
  * Σ|cell|² — grows quadratically with corpus size, while growing
  * `nLists` with the corpus holds per-cell population (and so cost per
  * doc) flat. One timed run per (dir, nLists) pair lets COVERAGE.md
  * tabulate both.
  *
  * `runMain graft.tools.SemDedupBench <sfDir> <nLists> [minCosine]
  * [dupCopies]` — prints corpus size, cell-population stats (max/p95 —
  * the quadratic term's base), and warm median-of-3 wall time for the
  * full semDedup (train + assign + within-cell pairwise + verdict
  * join, noop sink). With `dupCopies` > 1 the corpus is unioned with
  * that many BYTE-IDENTICAL id-shifted copies (the post-crawl,
  * pre-exact-dedup shape) and the exact-collapse plan is timed against
  * the retained all-pairs form — the measurement behind
  * `SemDedup.semDedupAssigned`'s collapse pre-pass.
  */
object SemDedupBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SemDedupBench <sfDir> <nLists> [minCosine] [dupCopies]")
    val sfDir = args(0)
    val nLists = args(1).toInt
    val minCosine = if (args.length > 2) args(2).toDouble else 0.3
    val dupCopies = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb =
      if (dupCopies <= 1) embBase
      else {
        val maxId = embBase.agg(max("vec_id")).first().getLong(0)
        (0 until dupCopies)
          .map(c => embBase.select(
            (col("vec_id") + lit(c.toLong * (maxId + 1L))).as("vec_id"),
            col("embedding"), col("label")))
          .reduce(_ unionByName _)
      }
    val n = emb.count()

    def run(): Double = {
      val t0 = System.nanoTime()
      val (result, _) = graft.ops.SemDedup.semDedup(emb, nLists, minCosine)
      result.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm-up
    val times = Seq.fill(3)(run()).sorted
    // decomposition: centroid training (driver Lloyd over the bounded
    // sample — grows with nLists × sampleSize, NOT with the corpus) vs
    // the distributed assign + within-cell pairwise pass
    val tTrain0 = System.nanoTime()
    val centsT = graft.ops.Ivf.trainCentroids(emb, nLists)
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    val tPair0 = System.nanoTime()
    graft.ops.SemDedup.semDedupAssigned(
      emb.withColumn("cell",
        graft.functions.ArgminCell.argminCell(col("embedding"), centsT)),
      minCosine)
      .write.format("noop").mode("overwrite").save()
    val pairSec = (System.nanoTime() - tPair0) / 1e9
    // cell-population shape (the Σ|cell|² base) from a fresh assignment
    val cents = centsT
    val cells = emb
      .withColumn("cell",
        graft.functions.ArgminCell.argminCell(col("embedding"), cents))
      .groupBy("cell").count()
      .agg(max("count"), expr("percentile(count, 0.95)"), avg("count"))
      .first()
    println(s"""{"op":"semdedup","sf":"$sfDir","n":$n,"nLists":$nLists,""" +
      s""""dup_copies":$dupCopies,""" +
      s""""median_sec":${times(1)},"train_sec":$trainSec,"pair_sec":$pairSec,""" +
      s""""max_cell":${cells.getLong(0)},""" +
      s""""p95_cell":${cells.getDouble(1)},"avg_cell":${cells.getDouble(2)}}""")
    if (dupCopies > 1) {
      // collapsed vs all-pairs head-to-head on the duplicated corpus
      val assigned = emb.withColumn("cell",
        graft.functions.ArgminCell.argminCell(col("embedding"), centsT))
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tFast = time(graft.ops.SemDedup.semDedupAssigned(assigned, minCosine)
        .write.format("noop").mode("overwrite").save())
      val tSlow = time(graft.ops.SemDedup.semDedupAssignedAllPairs(assigned, minCosine)
        .write.format("noop").mode("overwrite").save())
      println(s"""{"op":"semdedup_dup_ab","dup_copies":$dupCopies,"n":$n,""" +
        s""""collapsed_sec":$tFast,"all_pairs_sec":$tSlow}""")
    }
    spark.stop()
  }
}
