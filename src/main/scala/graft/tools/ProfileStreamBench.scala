package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.profileStream]] — the
  * live per-column data-quality monitor. Each micro-batch advances
  * event time one minute (windows close and their O(columns·k) state
  * evicts every batch); every row carries two numeric and one string
  * column with a sprinkling of nulls — the full battery (completeness
  * + KMV + range + decimal mean) runs per column per row.
  *
  * `runMain graft.tools.ProfileStreamBench [rowsPerBatch] [batches] [k]`
  */
object ProfileStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val k = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, java.lang.Long, java.lang.Long, String)]
    val q = Streaming
      .profileStream(
        input.toDF().toDF("ts", "qty", "price", "flag"),
        "ts", windowDur = "30 seconds", watermark = "10 seconds",
        numericCols = Seq("qty", "price"), stringCols = Seq("flag"), k = k)
      .writeStream.format("noop").outputMode("append").start()

    def batch(b: Int): Seq[(Timestamp, java.lang.Long, java.lang.Long, String)] =
      (0 until rowsPerBatch).map { i =>
        val qty: java.lang.Long = if (i % 97 == 0) null else java.lang.Long.valueOf(i % 50 + 1)
        val price: java.lang.Long = java.lang.Long.valueOf((i * 2654435761L) % 100000)
        val flag = if (i % 131 == 0) null else s"f${i % 7}"
        (new Timestamp(b.toLong * 60000L + (i % 60000)), qty, price, flag)
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
    println(s"""{"op":"profile_stream","rows":$rows,"batches":$batches,"k":$k,""" +
      s""""sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
