package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Trainer cost at large nLists — the [[graft.ops.Ivf]] driver-vs-
  * distributed crossover measurement:
  * `runMain graft.tools.KmeansBench [nVectors] [dim] [sampleSize] [nLists,...]`
  *
  * Emits one line per (trainer, nLists): wall seconds for a fixed
  * 4-iteration run over the same deterministic clustered corpus. The
  * driver trainer's assignment sweep is O(sample·nLists·dim) on one
  * machine; the distributed trainer shuffles sample·dim component rows
  * per iteration instead. Expectation: driver wins small nLists (no
  * per-iteration job overhead), distributed flattens the nLists term. */
object KmeansBench {
  def main(args: Array[String]): Unit = {
    val nVectors = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val sampleSize = if (args.length > 2) args(2).toInt else 100000
    val lists = if (args.length > 3) args(3).split(",").map(_.toInt).toSeq
      else Seq(1000, 10000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic clustered corpus (MogGen recipe, in-memory)
    val nClusters = 256
    val rng = new scala.util.Random(42)
    val centers = Array.fill(nClusters) {
      val c = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n).toFloat)
    }
    val bc = spark.sparkContext.broadcast(centers)
    val per = nVectors / 32
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext.parallelize(0 until 32, 32).flatMap { pid =>
      val cs = bc.value
      val r = new scala.util.Random(1000L + pid)
      (0 until per).iterator.map { i =>
        val c = cs(r.nextInt(cs.length))
        val v = c.map(x => x + (r.nextGaussian() * 0.15).toFloat)
        org.apache.spark.sql.Row((pid.toLong * per + i), v.toSeq)
      }
    }
    val corpus = spark.createDataFrame(rdd, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    lists.foreach { k =>
      val tDist = time(graft.ops.Ivf.trainCentroidsDistributed(corpus, k, sampleSize, iters = 4))
      println(f"""{"trainer":"distributed","nLists":$k,"sample":$sampleSize,"dim":$dim,"sec":$tDist%.2f}""")
      val tDriver = time(graft.ops.Ivf.trainCentroids(corpus, k, sampleSize, iters = 4))
      println(f"""{"trainer":"driver","nLists":$k,"sample":$sampleSize,"dim":$dim,"sec":$tDriver%.2f}""")
    }
    spark.stop()
  }
}
