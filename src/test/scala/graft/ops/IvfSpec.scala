package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF with full probing equals brute-force top-k") {
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ivf = Ivf.topK(e, q, k = 5, nLists = 4, nProbe = 4)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("IVF with partial probing keeps decent recall at a fraction of work") {
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(e, q, k = 10, nLists = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("hard negatives via IVF: full probing equals brute force exactly; partial probing keeps recall") {
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < 5)
    val (assigned, centroids) = Ivf.assignCells(e, nLists = 8)
    val brute = Similarity.hardNegatives(e, q, k = 8)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSeq
    val full = Ivf.hardNegativesIndexed(assigned, centroids, q, k = 8, nProbe = 8)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSeq
    assert(full == brute) // exhaustive probing IS the brute-force result
    val bruteSet = brute.map(t => (t._1, t._2)).toSet
    val partial = Ivf.hardNegativesIndexed(assigned, centroids, q, k = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & partial).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"recall $recall") // half the probe work, recorded in COVERAGE.md
  }

  test("static probed-cell index pruning changes I/O, never results") {
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < 3)
    val (assigned, centroids) = Ivf.assignCells(e, nLists = 8)
    // partitioned parquet round-trip, like a real served index
    val base = java.nio.file.Files.createTempDirectory("ivfspec-").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$base/assigned.parquet")
    centroids.write.mode("overwrite").parquet(s"$base/centroids.parquet")
    val a = spark.read.parquet(s"$base/assigned.parquet")
    val c = spark.read.parquet(s"$base/centroids.parquet")
    def canon(pruned: Boolean) = Ivf
      .topKIndexed(a, c, q, k = 5, nProbe = 3, pruneIndexScan = pruned)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(canon(pruned = true) == canon(pruned = false))
  }

  test("centroid training is invariant to input partitioning and row order") {
    val e = Tables.embeddings(spark, dir)
    val base = Ivf.trainCentroids(e, nLists = 4, sampleSize = 64)
    // same rows, radically different physical layout: reversed order,
    // different partition count — a limit()-style sample would collect a
    // different subset and train different centroids
    val shuffled = e.orderBy(col("vec_id").desc).repartition(7)
    val alt = Ivf.trainCentroids(shuffled, nLists = 4, sampleSize = 64)
    assert(base.length == alt.length)
    base.zip(alt).foreach { case (a, b) => assert(a.sameElements(b)) }
    val coalesced = Ivf.trainCentroids(e.coalesce(1), nLists = 4, sampleSize = 64)
    base.zip(coalesced).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("parallel-assignment lloyd is BIT-identical to the fused sequential sweep") {
    val rnd = new scala.util.Random(7)
    val sample = Array.fill(500)(Array.fill(16)(rnd.nextGaussian()))
    for (k <- Seq(1, 4, 33)) {
      val par = Ivf.lloyd(sample, k, iters = 6)
      val seq = Ivf.lloydFused(sample, k, iters = 6)
      assert(par.length == seq.length)
      par.zip(seq).foreach { case (a, b) =>
        a.zip(b).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y), s"k=$k: $x vs $y")
        }
      }
    }
  }

  test("distributed trainer: partition-invariant bits, driver-trainer agreement") {
    val e = Tables.embeddings(spark, dir)
    val dist = Ivf.trainCentroidsDistributed(e, nLists = 4, sampleSize = 64, iters = 4)
    // bit-identical across radically different physical layouts: the
    // decimal accumulation removes fp order from the one shuffled phase
    val alt = Ivf.trainCentroidsDistributed(
      e.orderBy(col("vec_id").desc).repartition(7), nLists = 4, sampleSize = 64, iters = 4)
    dist.zip(alt).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y), s"$x vs $y")
      }
    }
    // same recipe as the driver trainer ⇒ same sample, same init, same
    // tie-breaks; only the accumulation arithmetic differs (decimal vs
    // double) — centroids agree to fp tolerance
    val driver = Ivf.trainCentroids(e, nLists = 4, sampleSize = 64, iters = 4)
    dist.zip(driver).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, s"$x vs $y") }
    }
    // and on separated data the two trainers' ASSIGNMENTS are identical
    val sep = spark.createDataFrame(
      (0 until 90).map { i =>
        val c = i % 3
        (i.toLong, Seq.tabulate(8)(j => (c * 10.0 + (if (j == c) 1.0 else 0.0) + i * 1e-4).toFloat))
      }
    ).toDF("vec_id", "embedding")
    val d2 = Ivf.trainCentroidsDistributed(sep, nLists = 3, sampleSize = 90, iters = 4)
    val t2 = Ivf.trainCentroids(sep, nLists = 3, sampleSize = 90, iters = 4)
    val aDist = sep.withColumn("cell", graft.functions.ArgminCell.argminCell(col("embedding"), d2))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val aDriver = sep.withColumn("cell", graft.functions.ArgminCell.argminCell(col("embedding"), t2))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(aDist == aDriver)
  }

  test("rankCells fails fast on a corpus-sized queries frame (bounded limit-probe, no driver OOM)") {
    import org.apache.spark.sql.functions._
    val centroids = spark.createDataFrame(
      Seq((0, Seq(0.0)), (1, Seq(1.0)))).toDF("cell", "centroid")
    val huge = spark.range(Ivf.MaxServingBatch + 1L)
      .select(col("id").as("vec_id"), array(lit(0.5f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Ivf.rankCells(huge, centroids, nProbe = 1)
    }
    assert(e.getMessage.contains("serving-batch"))
    // and a batch at the cap boundary still serves
    val ok = spark.range(3L)
      .select(col("id").as("vec_id"), array(lit(0.5f)).as("embedding"))
    assert(Ivf.rankCells(ok, centroids, nProbe = 1).size == 3)
  }

  test("pretty formatting utilities") {
    import graft.util.Pretty
    assert(Pretty.bytes(512) == "512 bytes")
    assert(Pretty.bytes(2048) == "2.0 kB")
    assert(Pretty.int(1234567) == "1,234,567")
    assert(Pretty.duration(3725.5) == "01:02:05.500")
    assert(Pretty.duration(-61.0) == "-00:01:01")
    assert(Pretty.duration(90061.0) == "1d:01:01:01")
    assert(Pretty.duration(Double.PositiveInfinity) == "inf")
  }
}
