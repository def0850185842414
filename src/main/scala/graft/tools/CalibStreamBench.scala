package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.reliabilityStream]] +
  * [[Streaming.eceStream]] — the live calibration monitor. Each
  * micro-batch advances event time one minute (windows close and
  * their O(nBins) state evicts every batch); scores sweep the [0,1]
  * range incl. both clamp edges, labels mix so n_pos is non-trivial.
  *
  * `runMain graft.tools.CalibStreamBench [rowsPerBatch] [batches] [nBins]`
  */
object CalibStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val nBins = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def run(label: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val input = MemoryStream[(Timestamp, Double, Int)]
      val q = mk(input.toDF().toDF("ts", "score", "label"))
        .writeStream.format("noop").outputMode("append").start()
      def batch(b: Int): Seq[(Timestamp, Double, Int)] =
        (0 until rowsPerBatch).map { i =>
          (new Timestamp(b.toLong * 60000L + (i % 60000)),
            (i % 101) / 100.0, if (i % 3 == 0) 1 else 0)
        }
      input.addData(batch(0): _*) // warm-up outside the timed window
      q.processAllAvailable()
      val t0 = System.nanoTime()
      (1 to batches).foreach { b =>
        input.addData(batch(b): _*)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = rowsPerBatch.toLong * batches
      println(s"""{"op":"$label","rows":$rows,"batches":$batches,"bins":$nBins,""" +
        s""""sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
      q.stop()
    }

    run("reliability_stream", df => Streaming.reliabilityStream(
      df, "ts", "score", "label", windowDur = "30 seconds",
      watermark = "10 seconds", nBins = nBins))
    run("ece_stream", df => Streaming.eceStream(
      df, "ts", "score", "label", windowDur = "30 seconds",
      watermark = "10 seconds", nBins = nBins))
    // r15: the A/B readout twin, same synthetic stream with the score
    // split into three arms by residue
    run("ab_test_stream", df => Streaming.abTestStream(
      df.withColumn("variant",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("arm"),
          (org.apache.spark.sql.functions.col("label") +
            (org.apache.spark.sql.functions.col("score") * 100).cast("int") % 2).cast("string"))),
      "ts", "variant", "label",
      variants = Seq("arm0", "arm1", "arm2"), controlVariant = "arm0",
      windowDur = "30 seconds", watermark = "10 seconds"))
    // r16: the isotonic SERVE twin — stateless stream-static broadcast
    // join against a fit trained on the same score universe (101
    // buckets), so every row joins (no silent drop inflating the rate)
    val fit = graft.ops.Calibration.isotonicFit(
      (0 until 101).flatMap(i => Seq((i / 100.0, 1), (i / 100.0, if (i % 2 == 0) 1 else 0)))
        .toDF("score", "label"),
      "score", "label")
    run("isotonic_score_stream",
      df => Streaming.isotonicScoreStream(df, "score", fit))
    spark.stop()
  }
}
