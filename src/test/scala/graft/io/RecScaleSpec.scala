package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split-parallelism correctness: a recording big enough to decode as
  * MANY packet-aligned splits must produce exactly the same stream as a
  * single-split read — order, positions, values. */
class RecScaleSpec extends SparkSpec {

  test("multi-split decode == single-split decode on a 60k-packet recording") {
    val dir = Files.createTempDirectory("recscale").toFile.getPath
    val f = s"$dir/big.rec"
    val n = 60000
    // contiguous ts with a dupe burst and two gaps baked in
    val ts = (0 until n).map { i =>
      if (i < 30000) i.toLong
      else if (i < 30010) 30000L // 10 duplicate timestamps
      else if (i < 45000) (i - 9).toLong
      else (i - 9 + 500).toLong // gap of 500 at i=45000
    }
    RecSynth.write(f, ts.map(t => (t, (c: Int) => ((t + c) % 1000).toShort)))

    // force ~24 splits (packet = 73 B; 60k packets ≈ 4.4 MB)
    val multi = RecScan.read(spark, Seq(f), targetSplitBytes = 180000L)
    val single = RecScan.read(spark, Seq(f), targetSplitBytes = Long.MaxValue)
    assert(multi.rdd.getNumPartitions > 10, s"got ${multi.rdd.getNumPartitions} splits")
    assert(single.rdd.getNumPartitions == 1)

    val a = multi.orderBy("pos").select("pos", "ts", "values").collect()
    val b = single.orderBy("pos").select("pos", "ts", "values").collect()
    assert(a.length == n && b.length == n)
    a.zip(b).foreach { case (x, y) => assert(x == y) }

    // and the full extract pipeline survives: dupes keep-first, the 500
    // gap becomes an epoch boundary, everything else contiguous
    val out = ExtractChannels.extract(spark, Seq(f), maxGapSize = 150L)
      .where(col("channel") === 2)
    val total = out.count()
    // 59991 distinct ts, no interpolation across the 500-gap
    assert(total == n - 9)
    assert(out.where(col("interpolated") === 1).count() == 0)
    val segs = graft.ts.Sessionize
      .segments(
        graft.ts.Sessionize.withSegmentIdGlobal(out.select("ts"), "ts", 152L),
        "ts", 1L)
      .count()
    assert(segs == 2)
  }
}
