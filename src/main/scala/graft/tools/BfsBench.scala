package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[graft.ops.Graph.bfsDistances]] scale shape on the PrBench
  * power-law graphs: frontier rounds × (one edge equi-join + distinct
  * + anti-join). On a power-law graph the frontier EXPLODES after one
  * hop (hubs are reached immediately and fan out), so most nodes are
  * visited by round 2-3 and later rounds shrink — the loop is bounded
  * by reachable-set growth, not maxHops × edges.
  *
  * Usage: BfsBench [maxHops] [nSeeds] [nEdgesMillions...]
  * (default 4 100 1 10)
  */
object BfsBench {
  def main(args: Array[String]): Unit = {
    val maxHops = if (args.nonEmpty) args(0).toInt else 4
    val nSeeds = if (args.length > 1) args(1).toInt else 100
    val sizes = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 10)
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
          concat(lit("n"), powerLawNode(2, nNodes)).as("dst"))
        .where(col("src") =!= col("dst"))
      val seeds = spark.range(nSeeds)
        .select(concat(lit("n"), (col("id") * 37L) % nNodes).as("node"))
      val t0 = System.nanoTime()
      val res = graft.ops.Graph.bfsDistances(edges, seeds, maxHops, driverEdgeLimit = 0L)
      val byDist = res.groupBy("dist").agg(count(lit(1)).as("n"))
        .orderBy("dist").collect()
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"bfs","edges":$nEdges,"nodes":~$nNodes,"maxHops":$maxHops,"seeds":$nSeeds,"sec":$dt%.1f,"reached_by_dist":"$byDist"}""")
    }
    spark.stop()
  }
}
