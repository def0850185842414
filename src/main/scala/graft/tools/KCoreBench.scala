package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[graft.ops.Graph.kCore]] scale shape on the PrBench power-law
  * graphs — peeling rounds × (two semi-joins + one degree rollup);
  * power-law tails peel off in the first rounds, so the per-round work
  * SHRINKS as the loop converges.
  *
  * Usage: KCoreBench [k] [nEdgesMillions...]   (default k=5, 1 10)
  */
object KCoreBench {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 5
    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
      val core = graft.ops.Graph.kCore(edges, k = k, maxRounds = 30, driverEdgeLimit = 0L)
      val agg = core.agg(count(lit(1)).as("nodes"), min(col("core_degree"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"KCORE_RESULT edges=${m}M k=$k core_nodes=${agg.getLong(0)} " +
          f"min_core_deg=${agg.getLong(1)} sec=$sec%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
