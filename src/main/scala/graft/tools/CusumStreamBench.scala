package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.cusumStream]] — the live
  * per-source drift monitor. Each micro-batch carries `rowsPerBatch`
  * samples spread over `nKeys` monitored series; values oscillate
  * around the target with a slow per-key drift so most rows only
  * update the two-long state and a small tail trips the alarm
  * threshold (the steady-state mix a monitor sees). State is exactly
  * two longs per key by construction; the measured quantity is input
  * rows/s through the keyed-state stage.
  *
  * `runMain graft.tools.CusumStreamBench [rowsPerBatch] [batches] [nKeys]`
  */
object CusumStreamBench {
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

    def bd(s: String) = new java.math.BigDecimal(s)
    val input = MemoryStream[Streaming.CusumSample]
    val q = Streaming
      .cusumStream(input.toDS(), target = bd("10.00"), slack = bd("0.50"), h = bd("25.00"))
      .writeStream.format("noop").outputMode("append").start()

    // per batch: round-robin keys, ts strictly increasing per key
    // (the operator precondition); value = target ± a deterministic
    // oscillation plus a per-key bias so a minority of keys drift
    // into alarms while the rest hover inside the slack band
    def batch(b: Int): Seq[Streaming.CusumSample] =
      (0 until rowsPerBatch).map { i =>
        val k = (i * 2654435761L % nKeys).toInt
        val bias = if (k % 50 == 0) 0.8 else 0.0
        val osc = ((b * rowsPerBatch + i) % 7 - 3) * 0.3
        Streaming.CusumSample(s"k$k", b.toLong * rowsPerBatch + i, 10.0 + osc + bias)
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
    println(s"""{"op":"cusum_stream","rows":$rows,"batches":$batches,""" +
      s""""n_keys":$nKeys,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
