package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[graft.ops.Graph.hits]] DISTRIBUTED-loop scale shape on the same
  * deterministic power-law graphs as [[PrBench]] (the driver fast path
  * covers ≤ 2M edges in production; this forces the loop with
  * `driverEdgeLimit = 0` so the >gate path has measured rows like
  * pagerank's).
  *
  * Usage: HitsBench [nEdgesMillions...]   (default 1 10 50)
  */
object HitsBench {
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
      val scores = graft.ops.Graph.hits(edges, iterations = 5, driverEdgeLimit = 0L)
      val n = scores.count()
      val top = scores.orderBy(desc("authority")).limit(3).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"HITS_RESULT edges=${m}M nodes=$n sec=$sec%.2f top=${top
            .map(r => f"${r.getString(0)}:${r.getDouble(1)}%.6f")
            .mkString(",")}"
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
