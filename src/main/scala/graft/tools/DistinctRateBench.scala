package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.distinctRateStream]] —
  * the windowed KMV distinct monitor. Each micro-batch advances event
  * time one minute (windows close and their O(k) state evicts every
  * batch) over a churning item universe (a growing fraction of fresh
  * items per batch, the diversity signal the monitor exists to watch).
  *
  * `runMain graft.tools.DistinctRateBench [rowsPerBatch] [batches] [k] [md5|xx]`
  */
object DistinctRateBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val k = if (args.length > 2) args(2).toInt else 256
    val md5Hash = if (args.length > 3) args(3) == "md5" else true
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, String)]
    val q = Streaming
      .distinctRateStream(
        input.toDF().toDF("ts", "item"),
        "ts", "item", windowDur = "30 seconds", watermark = "10 seconds", k = k,
        md5Hash = md5Hash)
      .writeStream.format("noop").outputMode("append").start()

    // ~20k distinct per batch (heavy repeats) + batch-salted fresh tail
    def batch(b: Int): Seq[(Timestamp, String)] =
      (0 until rowsPerBatch).map { i =>
        val item =
          if (i % 10 == 0) s"fresh_${b}_$i" else s"item_${(i * 2654435761L) % 20000}"
        (new Timestamp(b.toLong * 60000L + (i % 60000)), item)
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
    println(s"""{"op":"distinct_rate_stream","rows":$rows,"batches":$batches,""" +
      s""""k":$k,"hash":"${if (md5Hash) "md5" else "xx"}","sec":$sec,""" +
      s""""rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
