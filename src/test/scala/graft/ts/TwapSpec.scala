package graft.ts

import graft.SparkSpec

class TwapSpec extends SparkSpec {
  import spark.implicits._

  // bucketUs = 100, maxHoldUs = 1000 (no staleness effect unless noted)
  private def run(rows: Seq[(String, Long, Double)], maxHoldUs: Long = 1000L) =
    Twap.twap(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v",
        bucketUs = 100L, maxHoldUs = maxHoldUs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  test("within-bucket steps weight by hold time; last obs extends to bucket end") {
    // bucket [0,100): v=10 holds [10,40) dur 30, v=20 holds [40,100) dur 60
    val got = run(Seq(("a", 10L, 10.0), ("a", 40L, 20.0)))
    val expect = BigDecimal((10.0 * 30 + 20.0 * 60) / 90)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(("a", 0L) -> ((2L, 90L, expect))))
  }

  test("a segment crossing a bucket boundary splits its duration exactly") {
    // v=10 at ts 50 holds to next obs at 150: [50,100) in bucket 0,
    // [100,150) in bucket 1; v=30 holds [150,200)
    val got = run(Seq(("a", 50L, 10.0), ("a", 150L, 30.0)))
    assert(got(("a", 0L)) == ((1L, 50L, 10.0)))
    assert(got(("a", 100L)) == ((2L, 100L, (10.0 * 50 + 30.0 * 50) / 100)))
  }

  test("staleness cutoff: a value stops holding after maxHoldUs") {
    // v=10 at ts 0, next obs at 500 — with maxHold 150 it holds [0,150)
    // only: all of bucket 0, half of bucket 1; buckets 2..4 are empty
    val got = run(Seq(("a", 0L, 10.0), ("a", 500L, 20.0)), maxHoldUs = 150L)
    assert(got(("a", 0L)) == ((1L, 100L, 10.0)))
    assert(got(("a", 100L)) == ((1L, 50L, 10.0)))
    assert(!got.contains(("a", 200L)) && !got.contains(("a", 300L)) && !got.contains(("a", 400L)))
    // the ts-500 obs extends to its bucket end
    assert(got(("a", 500L)) == ((1L, 100L, 20.0)))
  }

  test("keys never mix; exact decimal weighting (no float drift)") {
    val got = run(Seq(("a", 0L, 0.1), ("b", 0L, 0.3), ("a", 50L, 0.2)))
    // a: 0.1*50 + 0.2*50 over 100 = 0.15 exactly
    assert(got(("a", 0L)) == ((2L, 100L, 0.15)))
    assert(got(("b", 0L)) == ((1L, 100L, 0.3)))
  }

  test("partitioning-invariant") {
    val rows = (0 until 300).map(i => (s"u${i % 5}", i.toLong * 37, (i % 40).toDouble / 4))
    val a = run(rows)
    val b = Twap.twap(rows.toDF("k", "ts", "v").repartition(13), Seq("k"), "ts", "v",
        bucketUs = 100L, maxHoldUs = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(a == b)
  }
}
