package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.funnelStream]] — the live
  * ingest-acceptance funnel. Each micro-batch carries `rowsPerBatch`
  * events over a rolling user population: a third of the users are
  * fresh anchors (state inserts), the rest advance or repeat earlier
  * steps (state hits that mostly emit nothing — the steady-state mix a
  * monitor sees). State is O(steps) longs per user by construction;
  * the measured quantity is input rows/s through the keyed-state
  * stage.
  *
  * `runMain graft.tools.FunnelStreamBench [rowsPerBatch] [batches] [nUsers]`
  */
object FunnelStreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toInt else 100000
    val batches = if (args.length > 1) args(1).toInt else 10
    val nUsers = if (args.length > 2) args(2).toInt else 20000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val steps = Seq("fetch", "parse", "keep")
    val input = MemoryStream[Streaming.FunnelEvent]
    val q = Streaming
      .funnelStream(input.toDS(), steps, maxSpanUs = 1000L * 60 * 1000000)
      .writeStream.format("noop").outputMode("append").start()

    // per batch: each event picks a user from a rolling window (fresh
    // users enter every batch) and a step weighted toward the front of
    // the funnel; ts strictly increases within a user's event sequence
    // (per-key in-order, the operator precondition)
    def batch(b: Int): Seq[Streaming.FunnelEvent] =
      (0 until rowsPerBatch).map { i =>
        val u = ((b.toLong * rowsPerBatch / 3 + i * 2654435761L) % nUsers).toInt
        val step = steps((i % 7) match { case 0 | 1 | 2 => 0; case 3 | 4 => 1; case _ => 2 })
        Streaming.FunnelEvent(s"u$u", b.toLong * rowsPerBatch + i, step)
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
    println(s"""{"op":"funnel_stream","rows":$rows,"batches":$batches,""" +
      s""""n_users":$nUsers,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
