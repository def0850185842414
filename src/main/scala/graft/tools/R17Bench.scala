package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 measurement probes (COVERAGE.md rows — the two missing
  * measurement rows from the r16 verdict, plus the kernel-cut split):
  *
  *   runMain graft.tools.LoopScale [nEdgesMillions...]  (default 1 50)
  *     — the fixed-round loop family AFTER the r16 deferral (one-job
  *       materialization) at PrBench power-law scale: labelPropagation
  *       (3 rounds), hits (4 rounds), pagerank (5 rounds, tol=0) at 1M
  *       and 50M edges. The r16 verdict: only q_bfs_hops had a
  *       50M-edge row; the deferral changed stage overlap precisely
  *       where scale shows it.
  *
  *   runMain graft.tools.IsotonicScale [sfDir] [scaleDir]
  *     — q_isotonic_score operator shape at 1× vs 100× (ScaleGen dir):
  *       fit is bounded by distinct scores (101 here), serve is ONE
  *       broadcast join; expectation is linear-in-corpus scan cost,
  *       near-flat beyond it.
  *
  * Both: warmed min-of-3, noop sink, caches dropped between runs — the
  * graft.Bench discipline (R16Common.bench).
  */
object LoopScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 50)
    val spark = R16Common.session()

    def powerLawNode(salt: Int, nNodes: Long) = {
      val u = (abs(xxhash64(col("id") + lit(salt))) % 1000000L).cast("double") / 1000000.0
      floor(pow(u, 3.0) * nNodes.toDouble).cast("long")
    }

    sizes.foreach { m =>
      val nEdges = m * 1000000L
      val nNodes = math.max(1000L, nEdges / 10)
      def edges: DataFrame = spark
        .range(nEdges)
        .select(
          concat(lit("n"), powerLawNode(1, nNodes)).as("src"),
          concat(lit("n"), powerLawNode(2, nNodes)).as("dst"))
        .where(col("src") =!= col("dst"))

      // driverEdgeLimit = 0 pins the DISTRIBUTED loop at both sizes —
      // the deferral under measurement lives there (the driver fast
      // path would otherwise absorb the 1M row)
      R16Common.bench(spark, s"label_prop(3) ${m}M", () =>
        graft.ops.Graph.labelPropagation(edges, iterations = 3, driverEdgeLimit = 0L), repeats = 3)
      R16Common.bench(spark, s"hits(4) ${m}M", () =>
        graft.ops.Graph.hits(edges, iterations = 4, driverEdgeLimit = 0L), repeats = 3)
      R16Common.bench(spark, s"pagerank(5,tol=0) ${m}M", () =>
        graft.ops.Graph.pagerank(edges, iterations = 5, tol = 0.0, driverEdgeLimit = 0L),
        repeats = 3)
    }
    spark.stop()
  }
}

object IsotonicScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val scaleDir = if (args.length > 1) args(1) else "/tmp/scale100_001"
    val spark = R16Common.session()

    def scored(dir: String): DataFrame =
      graft.model.Tables.embeddings(spark, dir).select(
        ((col("vec_id") % 101).cast("decimal(9,4)") / 100).as("score"),
        when(col("vec_id") % 3 === 0, 1).otherwise(0).as("label"))

    def serve(dir: String): DataFrame = {
      val fit = graft.ops.Calibration.isotonicFit(scored(dir), "score", "label")
      graft.ops.Calibration.isotonicScore(scored(dir), "score", fit)
        .groupBy(col("calibrated"))
        .agg(
          count_distinct(col("score")).as("n_scores"),
          count(lit(1)).as("n_rows"),
          sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_pos"))
    }

    Seq(("1x", sfDir), ("100x", scaleDir)).foreach { case (label, dir) =>
      R16Common.bench(spark, s"isotonic_score $label", () => serve(dir), repeats = 3)
    }
    spark.stop()
  }
}
