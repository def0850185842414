package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.asofEnrichStream]] — the
  * ingest-time point-in-time lookup. Feeds `batches` micro-batches of
  * interleaved dimension updates + probe events across `nKeys` keys
  * (per-key in-order, the operator's precondition) into a noop sink and
  * reports rows/s over the drained run. State is O(keys) by
  * construction; the measurement confirms the rate holds as the total
  * volume grows (no per-batch degradation from state growth).
  *
  * `runMain graft.tools.AsofStreamBench [rowsPerBatch] [batches] [nKeys]`
  */
object AsofStreamBench {
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

    val input = MemoryStream[Streaming.AsOfInput]
    val q = Streaming.asofEnrichStream(input.toDS())
      .writeStream.format("noop").start()

    def batch(b: Int): Seq[Streaming.AsOfInput] =
      (0 until rowsPerBatch).map { i =>
        val key = s"k${i % nKeys}"
        val ts = b.toLong * rowsPerBatch + i
        // every 5th row refreshes the dimension; the rest probe
        if (i % 5 == 0) Streaming.AsOfInput(key, ts, 0, ts.toDouble)
        else Streaming.AsOfInput(key, ts, 1, 0.0)
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
    println(s"""{"op":"asof_enrich_stream","rows":$rows,"batches":$batches,""" +
      s""""n_keys":$nKeys,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
