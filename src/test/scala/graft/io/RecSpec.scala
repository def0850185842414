package graft.io

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Synthetic `.rec` writer — replaces the reference's missing gap_data.rec
  * fixture (FIXTURES.md §5.1): XML prefix + fixed 73-byte packets
  * (numChannels=32, header 5 = 1 start + 4 device bytes, 4 SpikeChannels).
  */
object RecSynth {
  val xml: String =
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

  /** packets: (ts, values for ALL 32 hw channels as a function of chan). */
  def write(path: String, packets: Seq[(Long, Int => Short)]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    out.write(xml.getBytes("US-ASCII"))
    writePackets(out, packets)
    out.close()
  }

  /** Append packets to an existing recording (the acquisition-time growth
    * shape the streaming source follows). */
  def append(path: String, packets: Seq[(Long, Int => Short)]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path, true))
    writePackets(out, packets)
    out.close()
  }

  private def writePackets(out: DataOutputStream, packets: Seq[(Long, Int => Short)]): Unit =
    packets.foreach { case (ts, f) =>
      out.write(Array.fill[Byte](5)(0)) // header
      out.write(Array[Byte](
        (ts & 0xff).toByte, ((ts >> 8) & 0xff).toByte,
        ((ts >> 16) & 0xff).toByte, ((ts >> 24) & 0xff).toByte))
      (0 until 32).foreach { c =>
        val v = f(c)
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      }
    }
}

class RecSpec extends SparkSpec {
  private val sampleDir = "/root/reference/sample_data"
  private def sample(i: Int) = s"$sampleDir/sample_data_$i.rec"

  test("parseConfig: sample workspace geometry") {
    val cfg = RecFormat.parseConfig(sample(1))
    assert(cfg.nChannels == 128)
    assert(cfg.headerSize == 42)
    assert(cfg.packetSize == 302)
    assert(cfg.samplingRate == 30000)
    assert(cfg.nSpikeChannels == 80)
    assert(cfg.configSectionSize == 21793L)
  }

  test("timestampBounds match the reference fixture table") {
    val expected = Map(
      1 -> (200917L, 190383308L),
      2 -> (216003235L, 430419684L),
      3 -> (428619684L, 617928812L),
      4 -> (648279793L, 824383837L),
      5 -> (864397337L, 1054846413L)
    )
    expected.foreach { case (i, (first, last)) =>
      val cfg = RecFormat.parseConfig(sample(i))
      assert(RecFormat.timestampBounds(cfg) == ((first, last)), s"file $i")
    }
  }

  test("catalog sorts files by start ts and summarizes the session") {
    // give files out of order; catalog must resort (io.py:88-96)
    val cat = RecScan.catalog(spark, Seq(sample(3), sample(1), sample(2)))
    val rows = cat.orderBy("file_rank").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq(sample(1), sample(2), sample(3)))
    assert(rows.forall(_.getLong(4) == 11L)) // 11 packets each
    val s = RecScan.sessionSummary(cat).collect()(0)
    assert(s.getAs[Long]("start_ts") == 200917L)
    assert(s.getAs[Long]("stop_ts") == 617928812L)
    assert(s.getAs[Long]("n_packets") == 33L)
  }

  test("distributed read decodes all packets with projected channels") {
    val df = RecScan.read(spark, Seq(sample(1)))
    assert(df.count() == 11)
    val r = df.orderBy("pos").collect()
    assert(r.head.getLong(2) == 200917L)
    assert(r.last.getLong(2) == 190383308L)
    assert(r.head.getSeq[Short](3).length == 80)
  }

  test("channel subset prunes at decode") {
    val df = RecScan.read(spark, Seq(sample(1)), channelSubset = Some(Seq(0, 5)))
    assert(df.first().getSeq[Short](3).length == 2)
  }

  test("extract_channels: dedup keep-first, small-gap interp, epoch split") {
    val dir = Files.createTempDirectory("recsynth").toFile.getPath
    val f1 = s"$dir/a.rec"
    // ts 0..3 contiguous, then 6 (gap of 2 missing → filled),
    // then 100 (epoch boundary), plus a DUPLICATE ts=2 with different data.
    val mk: Long => (Long, Int => Short) = ts => (ts, c => (ts * 10 + c).toShort)
    RecSynth.write(
      f1,
      Seq(mk(0), mk(1), mk(2), (2L, _ => 999.toShort), mk(3), mk(6), mk(100))
    )
    val out = ExtractChannels
      .extract(spark, Seq(f1), maxGapSize = 5L)
      .where(col("channel") === 1)
      .orderBy("ts")
      .collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Short]("value"), r.getAs[Int]("interpolated")))
    assert(out.toSeq == Seq(
      (0L, 1.toShort, 0), (1L, 11.toShort, 0),
      (2L, 21.toShort, 0), // duplicate dropped, FIRST kept
      (3L, 31.toShort, 0),
      (4L, 41.toShort, 1), (5L, 51.toShort, 1), // linear 31→61
      (6L, 61.toShort, 0),
      (100L, 1001.toShort, 0) // new epoch, no fill toward it
    ))
  }

  test("extractTo writes channel-partitioned parquet + validation report") {
    val dir = Files.createTempDirectory("recsynth2").toFile.getPath
    val f1 = s"$dir/a.rec"
    RecSynth.write(f1, (0L to 9L).map(ts => (ts, (c: Int) => (ts + c).toShort)))
    val outDir = s"$dir/out"
    val report = ExtractChannels.extractTo(spark, Seq(f1), outDir)
    val rows = report.orderBy("channel").collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_dup_rows") == 0L))
    // physical layout: one directory per channel (the reference's
    // file-per-channel layout, utils.py:536-539)
    val chDirs = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("channel="))
    assert(chDirs.length == 4)
  }

  test("extractTo zorderFiles: flat z-clustered layout, identical data + report") {
    val dir = Files.createTempDirectory("recsynth3").toFile.getPath
    val f1 = s"$dir/a.rec"
    RecSynth.write(f1, (0L to 9L).map(ts => (ts, (c: Int) => (ts + c).toShort)))
    val report = ExtractChannels.extractTo(
      spark, Seq(f1), s"$dir/z", zorderFiles = Some(2))
    assert(report.collect().forall(r =>
      r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_dup_rows") == 0L))
    // flat layout: no channel= directories, exactly the requested files
    val top = new java.io.File(s"$dir/z").listFiles()
    assert(!top.exists(_.getName.startsWith("channel=")))
    assert(top.count(_.getName.endsWith(".parquet")) == 2)
    // same rows as the partitioned layout
    ExtractChannels.extractTo(spark, Seq(f1), s"$dir/p")
    val a = spark.read.parquet(s"$dir/z").select("channel", "ts", "value")
      .collect().map(r => (r.getAs[Int]("channel"), r.getLong(1), r.getShort(2))).toSet
    val b = spark.read.parquet(s"$dir/p").select("channel", "ts", "value")
      .collect().map(r => (r.getAs[Int]("channel"), r.getLong(1), r.getShort(2))).toSet
    assert(a == b)
  }
}
