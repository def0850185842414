package graft.tools

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: end-to-end throughput of the jagular-shaped pipeline on a
  * locally generated synthetic `.rec` recording. Reports decode and
  * extract+filter rates in MB/s and samples/s. */
object Throughput {

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

  private def writeRec(path: String, nPackets: Int): Long = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    out.write(xml.getBytes("US-ASCII"))
    val header = Array.fill[Byte](5)(0)
    var ts = 0L
    var i = 0
    while (i < nPackets) {
      out.write(header)
      out.write((ts & 0xff).toInt); out.write(((ts >> 8) & 0xff).toInt)
      out.write(((ts >> 16) & 0xff).toInt); out.write(((ts >> 24) & 0xff).toInt)
      var c = 0
      while (c < 32) {
        val v = ((ts + c) % 2000 - 1000).toInt
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        c += 1
      }
      ts += 1
      i += 1
    }
    out.close()
    new java.io.File(path).length()
  }

  def main(args: Array[String]): Unit = {
    val nPackets = args.headOption.map(_.toInt).getOrElse(2000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("thr").toFile.getPath
    val f = s"$dir/big.rec"
    val bytes = writeRec(f, nPackets)
    println(f"generated $nPackets%,d packets, ${bytes / 1e6}%.1f MB")

    // warm-up on a small prefix file: first-job costs (whole-stage codegen
    // compile, JIT of the decode/gap-fill kernels, scheduler/broadcast
    // machinery) are one-time and would otherwise be billed to whichever
    // stage runs first — rounds 1-6 under-reported decode/extract by
    // 3-20x this way (ScanProbe: identical scan, 0.85-1.6 s cold vs
    // 0.14-0.2 s warm)
    val fw = s"$dir/warm.rec"
    writeRec(fw, 100000)
    graft.io.ExtractChannels.extract(spark, Seq(fw), maxGapSize = 150L).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    def median3(body: => Long): (Long, Double) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        // gap-fill's internal persist anchors would otherwise accumulate
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (n, dt)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    // decode-only scan
    val (cnt, dtDecode) = median3 {
      graft.io.RecScan.read(spark, Seq(f), targetSplitBytes = 8L << 20).count()
    }
    println(f"decode: $cnt%,d packets in $dtDecode%.2f s = ${bytes / 1e6 / dtDecode}%.1f MB/s, ${cnt * 4 / dtDecode / 1e6}%.1f Msamples/s")

    // full extract (dedup + sessionize + gapfill + fused explode)
    val (n2, dtExtract) = median3 {
      graft.io.ExtractChannels.extract(spark, Seq(f), maxGapSize = 150L).count()
    }
    println(f"extract: $n2%,d channel-samples in $dtExtract%.2f s = ${bytes / 1e6 / dtExtract}%.1f MB/s input rate")

    // materialized copy for the filter stage (not part of extract timing;
    // the reference's filtering likewise starts from written store)
    val extracted = graft.io.ExtractChannels
      .extract(spark, Seq(f), maxGapSize = 150L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    extracted.count()
    var t0 = System.nanoTime()
    var dt = 0.0

    // per-segment zero-phase bandpass on the extracted store (reuses the
    // segment_id the extract pipeline already computed)
    val sos = graft.dsp.FilterDesign.iirdesignCheby2(30000, Some(600), Some(6000))
    t0 = System.nanoTime()
    val filtered = graft.dsp.SosFiltFilt.filtfiltPerSegment(
      extracted, sos, Seq("channel", "segment_id"), "ts", "value")
    val n3 = filtered.count()
    dt = (System.nanoTime() - t0) / 1e9
    println(f"filtfilt: $n3%,d samples in $dt%.2f s = ${n3 / dt / 1e6}%.1f Msamples/s (${sos.length} sections)")

    // single-thread kernel rate for reference
    val x = Array.tabulate(4000000)(i => math.sin(i * 0.01))
    t0 = System.nanoTime()
    val y = graft.dsp.SosFiltFilt.filtfilt(sos, x)
    dt = (System.nanoTime() - t0) / 1e9
    println(f"kernel 1-thread: ${x.length / dt / 1e6}%.1f Msamples/s (checksum ${y.sum}%.3f)")
    spark.stop()
  }
}
