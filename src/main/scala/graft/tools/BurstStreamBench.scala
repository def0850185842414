package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.burstStream]] — the live
  * ripple monitor. Each micro-batch carries `rowsPerBatch` samples
  * over `nKeys` channels with unit-spaced per-key timestamps; values
  * idle below the low threshold with periodic above-high bursts a few
  * samples long (the steady-state mix a detector sees: mostly state
  * no-ops, a small tail opening/extending/closing events). State is
  * O(1) per key by construction; the measured quantity is input
  * rows/s through the keyed-state stage.
  *
  * `runMain graft.tools.BurstStreamBench [rowsPerBatch] [batches] [nKeys]`
  */
object BurstStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val nKeys = if (args.length > 2) args(2).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Streaming.Sample]
    val q = Streaming
      .burstStream(input.toDS(), hi = 8.0, lo = 4.0, mergeGapSamples = 3L, minSamples = 2L)
      .writeStream.format("noop").outputMode("append").start()

    val perKey = rowsPerBatch / nKeys
    // per key and batch: `perKey` consecutive samples; every 16-sample
    // phase carries a 3-sample burst (5.0, 9.0, 5.0) over the idle 1.0
    def batch(b: Int): Seq[Streaming.Sample] =
      (0 until rowsPerBatch).map { i =>
        val k = i % nKeys
        val step = b.toLong * perKey + (i / nKeys)
        val phase = step % 16
        val v = phase match {
          case 5 => 5.0
          case 6 => 9.0
          case 7 => 5.0
          case _ => 1.0
        }
        Streaming.Sample(s"k$k", step, v)
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
    println(s"""{"op":"burst_stream","rows":$rows,"batches":$batches,""" +
      s""""n_keys":$nKeys,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
