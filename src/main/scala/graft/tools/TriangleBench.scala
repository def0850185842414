package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[graft.ops.Graph.triangleCounts]] scale shape on the same
  * deterministic power-law graphs as [[PrBench]]/[[HitsBench]] — the
  * workload the degree-ordered orientation exists for: the power-law
  * head is exactly the hub that would explode an unordered
  * node-iterator (a 100k-degree node enumerates C(100k, 2) wedges
  * unordered; oriented it enumerates ~0 because every incident edge
  * points INTO it).
  *
  * Usage: TriangleBench [nEdgesMillions...]   (default 1 10 50)
  */
object TriangleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 50)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def powerLawNode(salt: Int, nNodes: Long) = {
      val u = (abs(xxhash64(col("id") + lit(salt))) % 1000000L).cast("double") / 1000000.0
      floor(pow(u, 3.0) * nNodes.toDouble).cast("long")
    }

    sizes.foreach { m =>
      val nEdges = m * 1000000L
      val nNodes = math.max(1000L, nEdges / 10)
      val edges = spark
        .range(nEdges)
        .select(
          concat(lit("n"), powerLawNode(1, nNodes)).as("src"),
          concat(lit("n"), powerLawNode(2, nNodes)).as("dst")
        )
        .where(col("src") =!= col("dst"))
      val t0 = System.nanoTime()
      val tc = graft.ops.Graph.triangleCounts(edges)
      val agg = tc.agg(
        count(lit(1)).as("nodes"),
        sum(col("n_triangles")).as("sum_nt"),
        max(col("degree")).as("max_deg")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"TRI_RESULT edges=${m}M nodes=${agg.getLong(0)} triangles=${agg.getLong(1) / 3} " +
          f"max_deg=${agg.getLong(2)} sec=$sec%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
