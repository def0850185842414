package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** Scale-shape measurement for decontamination (COVERAGE.md): the
  * declared q_decontaminate on a ScaleGen dir grows the BENCHMARK slice
  * with the corpus (every copy carries its own src0), which is not how
  * deployments scale — eval suites are fixed-size while the corpus
  * grows. This measures both axes on the same dir:
  *
  *   grown-bench: isBench = source = 'src0'            (bench 100×)
  *   fixed-bench: … AND doc_id <= <maxDid0>            (bench 1×, copy 0)
  *
  * `runMain graft.tools.DecontamBench <sfDir> [maxDid0]` — warmed,
  * median-of-3, one JSON line.
  */
object DecontamBench {
  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DecontamBench <sfDir> [maxDid0]")
    val dir = args(0)
    val maxDid0 = args.lift(1).map(_.toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(pred: org.apache.spark.sql.Column): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Decontaminate.overlapFlags(docs, pred, k = 3, minOverlap = 5)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (codegen, broadcast machinery)
      median(Seq.fill(3)(once()))
    }

    val grown = time(col("source") === "src0")
    val fixed = maxDid0.map(m => time(col("source") === "src0" && col("doc_id") <= m))
    val fixedStr = fixed.map(f => s""","fixed_bench_sec":$f""").getOrElse("")
    println(s"""{"tool":"decontam_bench","dir":"$dir","grown_bench_sec":$grown$fixedStr}""")
    spark.stop()
  }
}
