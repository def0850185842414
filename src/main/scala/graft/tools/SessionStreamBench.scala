package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.sessionCounts]] — gap
  * sessionization at ingest via Spark's native session_window state
  * (merging windows + watermark eviction). Feeds `batches`
  * micro-batches of per-key event bursts whose event time advances
  * each batch (so sessions keep closing and state keeps getting
  * evicted) into a noop sink and reports rows/s over the drained run.
  * State is O(keys × open sessions); the advancing watermark bounds
  * it regardless of run length.
  *
  * `runMain graft.tools.SessionStreamBench [rowsPerBatch] [batches] [nKeys]`
  */
object SessionStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val nKeys = if (args.length > 2) args(2).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, Timestamp)]
    val q = Streaming
      .sessionCounts(input.toDF().toDF("k", "ts"), "ts", "k", "10 seconds")
      .writeStream.format("noop").outputMode("append").start()

    // each batch advances one minute: three ~5 s bursts per key per
    // minute with >10 s gaps between them ⇒ sessions close every batch
    def batch(b: Int): Seq[(String, Timestamp)] =
      (0 until rowsPerBatch).map { i =>
        val key = s"k${i % nKeys}"
        val burst = (i / nKeys) % 3
        val withinMs = (i * 37) % 5000
        (key, new Timestamp(b.toLong * 60000L + burst * 20000L + withinMs))
      }

    // warm one batch outside the timed window (state init + codegen)
    input.addData(batch(0): _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    (1 to batches).foreach { b =>
      input.addData(batch(b): _*)
      q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = rowsPerBatch.toLong * batches
    println(s"""{"op":"session_counts_stream","rows":$rows,"batches":$batches,""" +
      s""""n_keys":$nKeys,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
