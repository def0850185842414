package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the `maxDocFreq` knob actually buys q_ngram_jaccard at
  * scale — `runMain graft.tools.NgramCapBench [sfDir] [cap]`.
  *
  * The exact blocked n-gram Jaccard operator's cost at 100× data is
  * dominated by bucket fan-out: stopword-ish shingles shared by many
  * documents of a block generate pairs quadratically while carrying no
  * dedup signal. `maxDocFreq` drops those shingles from the universe
  * ([[graft.ops.DedupDocs.ngramJaccardPairs]]). This tool puts a NUMBER
  * behind that sentence: wall time (median of 3, interleaved passes like
  * graft.Bench) and the pair-set delta (recall of the uncapped pair set,
  * plus pairs only the capped run reports — capping rescales the Jaccard
  * denominator, so near-threshold pairs can cross in either direction).
  *
  * Prints one JSON line:
  * `{"metric":"ngram_cap","cap":N,"t_uncapped":s,"t_capped":s,
  *   "pairs_uncapped":N,"pairs_capped":N,"pairs_common":N,
  *   "recall_vs_uncapped":r}`.
  */
object NgramCapBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cap = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    def run(maxDocFreq: Option[Int]): DataFrame =
      graft.ops.DedupDocs.ngramJaccardPairs(
        docs, k = 3, threshold = 0.8, blockCol = "source", maxDocFreq = maxDocFreq)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up pass (codegen/JIT), then interleaved repeats — same noise
    // discipline as graft.Bench: back-to-back repeats let one transient
    // disturbance own all three
    time(run(None)); time(run(Some(cap)))
    val (tU, tC) = {
      val runs = (1 to 3).map(_ => (time(run(None)), time(run(Some(cap)))))
      (runs.map(_._1).sorted.apply(1), runs.map(_._2).sorted.apply(1))
    }

    val uncapped = run(None).select("doc_a", "doc_b").persist()
    val capped = run(Some(cap)).select("doc_a", "doc_b").persist()
    val nU = uncapped.count()
    val nC = capped.count()
    val nCommon = uncapped.intersect(capped).count()
    val recall = if (nU == 0) 1.0 else nCommon.toDouble / nU

    println(
      f"""{"metric":"ngram_cap","sf_dir":"$sfDir","cap":$cap,"t_uncapped":$tU%.2f,"t_capped":$tC%.2f,"pairs_uncapped":$nU,"pairs_capped":$nC,"pairs_common":$nCommon,"recall_vs_uncapped":$recall%.4f}""")
    spark.stop()
  }
}
