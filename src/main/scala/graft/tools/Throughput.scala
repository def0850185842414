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

    // decode-only scan
    var t0 = System.nanoTime()
    val decoded = graft.io.RecScan.read(spark, Seq(f), targetSplitBytes = 8L << 20)
    val cnt = decoded.count()
    var dt = (System.nanoTime() - t0) / 1e9
    println(f"decode: $cnt%,d packets in $dt%.2f s = ${bytes / 1e6 / dt}%.1f MB/s, ${cnt * 4 / dt / 1e6}%.1f Msamples/s")

    // full extract (dedup + sessionize + gapfill + explode), materialized
    // so the next stage doesn't recompute the lineage
    t0 = System.nanoTime()
    val extracted = graft.io.ExtractChannels
      .extract(spark, Seq(f), maxGapSize = 150L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = extracted.count()
    dt = (System.nanoTime() - t0) / 1e9
    println(f"extract: $n2%,d channel-samples in $dt%.2f s = ${bytes / 1e6 / dt}%.1f MB/s input rate")

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
