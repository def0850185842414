package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Sustained-rate measurement for [[Streaming.trendingTokensStream]] —
  * the watermarked windowed Space-Saving top-k at ingest. Feeds
  * `batches` micro-batches of synthetic docs (Zipf-ish token draws so
  * the sketch sees realistic head/tail skew) with event time advancing
  * one window per batch, into a noop sink in append mode, and reports
  * docs/s and tokens/s over the drained run. State per window is the
  * sketch capacity (not the vocabulary), so the rate should hold as
  * volume grows; the advancing watermark closes and evicts old windows.
  *
  * `runMain graft.tools.TrendingStreamBench [docsPerBatch] [batches] [tokensPerDoc]`
  */
object TrendingStreamBench {
  final case class TrendDoc(ts: Timestamp, text: String)

  def main(args: Array[String]): Unit = {
    val docsPerBatch = if (args.length > 0) args(0).toInt else 20000
    val batches = if (args.length > 1) args(1).toInt else 10
    val tokensPerDoc = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[TrendDoc]
    val q = Streaming.trendingTokensStream(
        input.toDF(), "ts", "10 minutes", "5 minutes", k = 10, capacity = 256)
      .writeStream.format("noop").start()

    // Deterministic Zipf-ish draw over a 50k vocab: token rank from a
    // hash-mixed index so every batch has the same head/tail shape.
    def doc(b: Int, i: Int): String = {
      val sb = new StringBuilder
      var j = 0
      while (j < tokensPerDoc) {
        val h = (b * 1000003 + i * 31 + j * 7919) & 0x7fffffff
        val r = (h % 1000) + 1
        val rank = if (r <= 500) h % 10 else if (r <= 850) h % 500 else h % 50000
        if (j > 0) sb.append(' ')
        sb.append('t').append(rank)
        j += 1
      }
      sb.toString
    }

    def batch(b: Int): Seq[TrendDoc] = {
      val winStart = b.toLong * 600000L // one 10-min window per batch
      (0 until docsPerBatch).map { i =>
        TrendDoc(new Timestamp(winStart + (i % 600000)), doc(b, i))
      }
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
    val docs = docsPerBatch.toLong * batches
    val toks = docs * tokensPerDoc
    println(s"""{"op":"trending_tokens_stream","docs":$docs,"batches":$batches,""" +
      s""""tokens":$toks,"sec":$sec,"docs_per_sec":${(docs / sec).toLong},""" +
      s""""tokens_per_sec":${(toks / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
