package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[graft.ops.Graph.pagerank]] scale shape on synthetic power-law
  * graphs (the web-link shape: few hub nodes collect most in-edges).
  * Deterministic: node ids come from an inverse-power transform of
  * xxhash64 uniforms, so every run builds the identical graph.
  *
  * Usage: PrBench [nEdgesMillions...]   (default 1 10 50)
  */
object PrBench {
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
      // u ∈ [0,1) from the hash; node = floor(u^3 · n) skews mass toward
      // low ids (hubs) with a Zipf-ish in-degree tail
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
      // driverEdgeLimit = 0: this bench measures the DISTRIBUTED loop
      val ranks = graft.ops.Graph.pagerank(edges, iterations = 5, driverEdgeLimit = 0L)
      val n = ranks.count()
      val top = ranks.orderBy(desc("rank")).limit(3).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"PR_RESULT edges=${m}M nodes=$n sec=$sec%.2f top=${top.map(r => f"${r.getString(0)}:${r.getDouble(1)}%.6f").mkString(",")}"
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
