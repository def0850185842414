package graft

import java.nio.file.Files

import graft.io.RecSynth
import org.apache.spark.sql.functions._

/** End-to-end: the reference workflow (file map → extract → filter →
  * detect) through the Graft facade, on the real sample `.rec` files and
  * on a synthetic recording with a planted spike. */
class GraftE2ESpec extends SparkSpec {

  private val samples = (1 to 5).map(i => s"/root/reference/sample_data/sample_data_$i.rec")

  test("facade: catalog + summary over the five sample files") {
    val s = Graft.open(spark, samples.reverse) // deliberately out of order
    assert(s.catalog.count() == 5)
    val sm = s.summary.collect()(0)
    assert(sm.getAs[Long]("start_ts") == 200917L)
    assert(sm.getAs[Long]("stop_ts") == 1054846413L)
    assert(sm.getAs[Long]("n_packets") == 55L)
    assert(sm.getAs[Int]("fs") == 30000)
    assert(sm.getAs[Long]("duration_w_gaps") ==
      sm.getAs[Long]("stop_ts") - sm.getAs[Long]("start_ts"))
  }

  test("facade: packetsBetween pushes the ts range into the rec source") {
    val s = Graft.open(spark, samples)
    // range inside sample_data_1 only (its bounds: 200917..190383308)
    val q = s.packetsBetween(200917L, 1000000L)
    val got = q.select("ts").collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.forall(t => t >= 200917L && t <= 1000000L))
    // equivalent filter over the full programmatic scan agrees
    val want = s.packets()
      .where(col("ts").between(200917L, 1000000L))
      .select("ts").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("facade: extract over the wild-timestamped sample files") {
    val dir = Files.createTempDirectory("e2e").toFile.getPath
    val s = Graft.open(spark, samples.take(2))
    val store = s.extractChannels(s"$dir/store", maxGapSize = 5L)
    // 22 packets, all ts distinct, huge gaps → no interpolation
    assert(store.select("ts").distinct().count() == 22)
    assert(store.where(col("interpolated") === 1).count() == 0)
    assert(store.select("channel").distinct().count() == 80)
    // per channel: exactly the 22 kept samples
    val perCh = store.groupBy("channel").count().select("count").distinct().collect()
    assert(perCh.map(_.getLong(0)).toSeq == Seq(22L))
  }

  test("e2e synthetic: extract → filtfilt → detectSpikes finds the planted spike") {
    val dir = Files.createTempDirectory("e2e2").toFile.getPath
    val f = s"$dir/rec.rec"
    // 600 samples; broadband noise-free baseline with a sharp negative
    // spike at ts=300 on all channels
    val packets = (0L until 600L).map { ts =>
      val base = math.sin(ts * 0.02) * 20
      val spike = if (ts >= 298 && ts <= 302) -800.0 * (1.0 - math.abs(ts - 300) / 3.0) else 0.0
      (ts, (c: Int) => (base + spike).toShort)
    }
    RecSynth.write(f, packets)
    val s = Graft.open(spark, Seq(f))
    val store = s.extractChannels(s"$dir/store")
    val filtered = s.filtfilt(store, fl = Some(600), fh = Some(6000), fs = 30000)
    assert(filtered.count() == 600 * 4)
    val ch0 = filtered.where(col("channel") === 0).select(col("ts"), col("value"))
    val spikes = Graft.detectSpikes(ch0, "ts", "value",
      threshold = 4.0, polarity = "neg", censorWidth = 30, patchHalfWidth = 5)
    val peaks = spikes.select("peak_idx").distinct().collect().map(_.getLong(0)).sorted
    // the sharp spike rings symmetrically through the zero-phase bandpass,
    // so nearby echo crossings are legitimate; require the true spike to
    // be detected and everything detected to be its neighborhood
    assert(peaks.exists(p => math.abs(p - 299) <= 2), s"peaks: ${peaks.toSeq}")
    assert(peaks.length <= 5, s"peaks: ${peaks.toSeq}")
    assert(peaks.forall(p => math.abs(p - 300) < 60), s"peaks: ${peaks.toSeq}")
    // patch shape: 2*halfWidth rows per peak
    assert(spikes.count() == peaks.length * 10)
  }
}
