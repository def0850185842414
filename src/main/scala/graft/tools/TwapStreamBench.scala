package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.twapStream]]: per-key
  * in-order samples, 1-minute buckets, 2-minute staleness — every
  * batch advances time so segments close and emit steadily.
  *
  * `runMain graft.tools.TwapStreamBench [rowsPerBatch] [batches] [keys]`
  */
object TwapStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val keys = if (args.length > 2) args(2).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Streaming.Sample]
    val q = Streaming.twapStream(input.toDS(), bucketUs = 60000000L, maxHoldUs = 120000000L)
      .writeStream.format("noop").outputMode("append").start()

    def batch(b: Int): Seq[Streaming.Sample] = {
      val perKey = rowsPerBatch / keys
      (0 until rowsPerBatch).map { i =>
        val k = i % keys
        val seq = b.toLong * perKey + i / keys // per-key monotone
        Streaming.Sample(s"k$k", seq * 7000000L + k, ((i * 31) % 1000) / 10.0)
      }
    }

    input.addData(batch(0): _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    (1 to batches).foreach { b =>
      input.addData(batch(b): _*)
      q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = rowsPerBatch.toLong * batches
    println(s"""{"op":"twap_stream","rows":$rows,"batches":$batches,"keys":$keys,""" +
      s""""sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
