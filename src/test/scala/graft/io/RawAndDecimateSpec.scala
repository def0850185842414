package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.dsp.Decimate
import graft.spikes.Tetrode
import org.apache.spark.sql.functions._

class RawAndDecimateSpec extends SparkSpec {
  import spark.implicits._

  test("raw channel + sidecar roundtrip (uint32 ts)") {
    val dir = Files.createTempDirectory("raw").toFile.getPath
    val df = Seq((0, 100L, 5.toShort), (0, 101L, -7.toShort), (0, 103L, 32767.toShort),
      (0, 104L, -32768.toShort))
      .toDF("channel", "ts", "value")
    RawChannelScan.writeRawLayout(df, dir)
    val back = RawChannelScan
      .read(spark, s"$dir/ch.0.raw", s"$dir/timestamps.raw", tsBytes = 4)
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(0), r.getShort(1)))
    assert(back.toSeq == Seq((100L, 5.toShort), (101L, -7.toShort),
      (103L, 32767.toShort), (104L, -32768.toShort)))
  }

  test("raw channel read honors uint64 sidecar (reader default)") {
    val dir = Files.createTempDirectory("raw64").toFile.getPath
    // hand-write: 2 samples, uint64 ts
    val ch = new java.io.FileOutputStream(s"$dir/ch.raw")
    ch.write(Array[Byte](1, 0, 2, 0)); ch.close()
    val ts = new java.io.FileOutputStream(s"$dir/ts.raw")
    ts.write(Array[Byte](9, 0, 0, 0, 0, 0, 0, 0, 10, 0, 0, 0, 0, 0, 0, 0)); ts.close()
    val back = RawChannelScan.read(spark, s"$dir/ch.raw", s"$dir/ts.raw", tsBytes = 8)
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getShort(1)))
    assert(back.toSeq == Seq((9L, 1.toShort), (10L, 2.toShort)))
  }

  test("dumbsample keeps every q-th sample per segment plus the last") {
    val df = (0L until 25L).map(i => ("s", i)).toDF("seg", "ts")
    val out = Decimate.dumbsample(df, 10, "ts", Seq("seg"))
      .orderBy("ts").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(0L, 10L, 20L, 24L))
  }

  test("decimate lowpasses then downsamples; row count matches") {
    val n = 200
    val df = (0 until n).map(i => ("s", i.toLong, math.sin(i * 0.05))).toDF("seg", "ts", "v")
    val out = Decimate.decimate(df, q = 10, tsCol = "ts", valueCol = "v", keys = Seq("seg"))
    assert(out.count() == 21) // 20 strided + final sample
    // a slow sine survives decimation roughly intact at kept points
    val kept = out.orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    kept.filter { case (ts, _) => ts > 20 && ts < 180 }.foreach { case (ts, v) =>
      assert(math.abs(v - math.sin(ts * 0.05)) < 0.05, s"ts=$ts v=$v")
    }
  }

  test("tetrode assembly concatenates per-channel patches, filters amplitude") {
    // 4 channels, 40 samples; spike at idx 20 on all channels
    val samples = for {
      c <- 0 until 4
      i <- 0 until 40
    } yield (c, i.toLong, if (math.abs(i - 20) <= 2) (100.0 - 20 * math.abs(i - 20)) * (c + 1) else 0.0)
    val df = samples.toDF("channel", "idx", "value")
    val peaks = Seq(20L).toDF("idx")
    val out = Tetrode.formTetrode(df, peaks, "idx", "channel", "value",
      halfWidth = 3, maxAmplitude = 500.0, sampRate = 30000.0)
    val row = out.collect()(0)
    val vec = row.getSeq[Double](1)
    assert(vec.length == 24) // 4 channels × 6 samples
    // channel-major: channel 0 patch first; peak value 100 at offset 0
    assert(vec(3) == 100.0)
    assert(vec(9) == 200.0)
    assert(math.abs(row.getDouble(0) - 20.0 / 30000.0) < 1e-9) // time_s is round(·, 9)
    // amplitude filter: channel 3 peaks at 400 < 500 passes; tighten to 300 → dropped
    val strict = Tetrode.formTetrode(df, peaks, "idx", "channel", "value",
      halfWidth = 3, maxAmplitude = 300.0, sampRate = 30000.0)
    assert(strict.count() == 0)
  }
}
