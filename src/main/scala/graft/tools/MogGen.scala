package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Generate a CLUSTERED embeddings table (mixture of Gaussians) for ANN
  * recall measurement:
  * `runMain graft.tools.MogGen <outDir> [nVectors] [nClusters] [dim] [sigma]`.
  *
  * ScaleGen's sign-flip copies deliberately have WEAK cluster structure
  * (near-random vectors), which bounds IVF recall regardless of nProbe —
  * fine for cost-shape measurement, useless for a recall-vs-nProbe curve.
  * A mixture of Gaussians is the textbook regime IVF is built for: each
  * Voronoi cell tracks a mode, so recall should approach 1 at
  * nProbe ≪ nLists. Deterministic (fixed seed), distributed generation
  * (one seed per partition, centers broadcast). */
object MogGen {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MogGen <outDir> [nVectors] [nClusters] [dim] [sigma]")
    val out = args(0)
    val nVectors = if (args.length > 1) args(1).toInt else 200000
    val nClusters = if (args.length > 2) args(2).toInt else 64
    val dim = if (args.length > 3) args(3).toInt else 64
    val sigma = if (args.length > 4) args(4).toDouble else 0.15
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // unit-norm cluster centers, fixed seed
    val rng = new scala.util.Random(42)
    val centers = Array.fill(nClusters) {
      val c = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n).toFloat)
    }
    val bc = spark.sparkContext.broadcast(centers)

    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false)
    ))
    val rdd = spark.sparkContext
      .parallelize(0 until 32, 32)
      .flatMap { pid =>
        val cs = bc.value
        val r = new scala.util.Random(1000L + pid)
        val lo = pid.toLong * nVectors / 32
        val hi = (pid + 1).toLong * nVectors / 32
        (lo until hi).iterator.map { i =>
          val k = r.nextInt(cs.length)
          val c = cs(k)
          val v = Array.tabulate(dim)(j => c(j) + (r.nextGaussian() * sigma).toFloat)
          Row(i, v.toSeq, k)
        }
      }
    spark.createDataFrame(rdd, schema)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"""{"mog":"done","n":$nVectors,"clusters":$nClusters,"dim":$dim,"sigma":$sigma,"out":"$out"}""")
    spark.stop()
  }
}
