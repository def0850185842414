package graft.tools

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Sustained-rate measurement of the `.rec` micro-batch source: a writer
  * thread APPENDS packets to a live recording (the acquisition-system
  * shape the streaming source exists for) while a ProcessingTime query
  * drains it through the noop sink. Reports packets/s and MB/s over the
  * steady-state window, vs the 30 kHz realtime ingest rate the reference's
  * sample hardware implies (9.06 MB/s).
  * `runMain graft.tools.StreamBench [totalPackets] [chunks] [mode]`
  *
  * `mode=raw` (default) drains packets as-is — the source ceiling.
  * `mode=extract` runs the ACQUISITION-TIME EXTRACT as a stream: packets
  * explode to per-channel samples (32×), and
  * [[graft.streaming.Streaming.gapFillStream]] carries (prev_ts, value)
  * per channel across micro-batches, interpolating small gaps exactly
  * like the reference's across-block generator state
  * (jagular/utils.py:443-477). The writer injects a 4-ts jump every 1000
  * packets in this mode so the state machine does real gap work. Rates
  * stay in INPUT packets/s — directly comparable to raw mode. */
object StreamBench {

  private val xml: String =
    """<Configuration>
      |<HardwareConfiguration numChannels="32" samplingRate="30000">
      |<Device name="ECU" numBytes="4"/>
      |</HardwareConfiguration>
      |<SpikeConfiguration>
      |<SpikeNTrode id="1">
      |<SpikeChannel hwChan="0"/>
      |<SpikeChannel hwChan="1"/>
      |<SpikeChannel hwChan="2"/>
      |<SpikeChannel hwChan="3"/>
      |</SpikeNTrode>
      |</SpikeConfiguration>
      |</Configuration>
      |""".stripMargin

  private def writePackets(out: DataOutputStream, from: Long, n: Long, gapped: Boolean = false): Unit = {
    val header = Array.fill[Byte](5)(0)
    var idx = from
    val end = from + n
    while (idx < end) {
      // gapped: a 4-ts jump every 1000 packets (ts derived from the
      // packet INDEX, so chunked appends stay consistent and monotonic)
      val ts = if (gapped) idx + 4L * (idx / 1000L) else idx
      out.write(header)
      out.write((ts & 0xff).toInt); out.write(((ts >> 8) & 0xff).toInt)
      out.write(((ts >> 16) & 0xff).toInt); out.write(((ts >> 24) & 0xff).toInt)
      var c = 0
      while (c < 32) {
        val v = ((ts + c) % 2000 - 1000).toInt
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        c += 1
      }
      idx += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toLong).getOrElse(8000000L)
    val chunks = if (args.length > 1) args(1).toInt else 40
    val mode = if (args.length > 2) args(2) else "raw"
    require(mode == "raw" || mode == "extract", s"mode must be raw|extract, got $mode")
    val gapped = mode == "extract"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("streambench").toFile.getPath
    val f = s"$dir/live.rec"
    val packetSize = 5 + 4 + 64
    // seed: config + first chunk, so the source can parse geometry
    val chunkN = total / chunks
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 20))
    out.write(xml.getBytes("US-ASCII"))
    writePackets(out, 0, chunkN, gapped)
    out.flush()

    // accumulate across ALL batches (recentProgress is a sliding window)
    val totalRows = new java.util.concurrent.atomic.AtomicLong
    val busyMs = new java.util.concurrent.atomic.AtomicLong
    val nBatches = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) {
          totalRows.addAndGet(e.progress.numInputRows)
          busyMs.addAndGet(e.progress.durationMs.getOrDefault("triggerExecution", 0L).toLong)
          nBatches.incrementAndGet()
        }
    })

    // extract mode: bound admission so the stateful stage sorts modest
    // per-batch groups instead of a few giant ones (backpressure knob)
    val reader = spark.readStream.format("rec")
    val raw =
      (if (mode == "extract") reader.option("maxPacketsPerTrigger", "250000") else reader)
        .load(f)
    val transformed =
      if (mode == "raw") raw
      else {
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val samples = raw
          .select(col("ts"), posexplode(col("values")).as(Seq("channel", "value")))
          .select(
            concat(lit("ch"), col("channel")).as("key"),
            col("ts"),
            col("value").cast("double").as("value"))
          .as[graft.streaming.Streaming.Sample]
        graft.streaming.Streaming.gapFillStream(samples, step = 1L, maxGapSize = 150L).toDF()
      }
    val q = transformed.writeStream
      .format("noop")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    // append the remaining chunks at full disk speed — the question is
    // how fast the source DRAINS, so the writer must never be the
    // bottleneck (it writes ~GB/s; realtime hardware writes 9 MB/s)
    val t0 = System.nanoTime()
    var written = chunkN
    while (written < total) {
      val n = math.min(chunkN, total - written)
      writePackets(out, written, n, gapped)
      out.flush()
      written += n
      Thread.sleep(20)
    }
    out.close()

    // wait until the stream has delivered everything
    var spins = 0
    while (totalRows.get() < total && spins < 3000) {
      Thread.sleep(100)
      spins += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()

    val mb = total.toDouble * packetSize / 1e6
    val wallRate = total / wall
    val busyRate =
      if (busyMs.get() > 0) totalRows.get() * 1000.0 / busyMs.get() else Double.NaN
    println(
      s"""{"stream":"bench","mode":"$mode","packets":$total,"batches":${nBatches.get()},""" +
        s""""wall_sec":$wall,"delivered":${totalRows.get()},""" +
        f""""wall_packets_per_sec":$wallRate%.0f,"busy_packets_per_sec":$busyRate%.0f,""" +
        f""""wall_mb_per_sec":${mb / wall}%.1f,""" +
        f""""x_realtime_30khz":${wallRate / 30000.0}%.1f}"""
    )
    spark.stop()
  }
}
