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

    // per-job wall clock (SPARK_GRAFT_PRBENCH_JOBS=1): where a loop
    // variant's time goes
    if (sys.env.get("SPARK_GRAFT_PRBENCH_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.getOrDefault(j.jobId, 0L)
          if (t0 > 0) println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%8.3fs")
        }
      })
    }

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
      // SPARK_GRAFT_PPR=1 measures the personalized variant INSTEAD
      // (fresh-JVM comparability: back-to-back runs in one session
      // share executor storage pressure)
      val pprMode = sys.env.get("SPARK_GRAFT_PPR").contains("1")
      val t0 = System.nanoTime()
      // driverEdgeLimit = 0: this bench measures the DISTRIBUTED loop
      val ranks =
        if (pprMode) {
          val seeds = spark.range(100).select(concat(lit("n"), col("id") * 37L).as("node"))
          graft.ops.Graph.pagerank(edges, iterations = 5, driverEdgeLimit = 0L,
            restartNodes = Some(seeds))
        } else graft.ops.Graph.pagerank(edges, iterations = 5, driverEdgeLimit = 0L)
      val n = ranks.count()
      val top = ranks.orderBy(desc("rank")).limit(3).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val label = if (pprMode) "PPR_RESULT" else "PR_RESULT"
      println(
        f"$label edges=${m}M nodes=$n sec=$sec%.2f top=${top.map(r => f"${r.getString(0)}:${r.getDouble(1)}%.6f").mkString(",")}"
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
