package graft.ts

import graft.SparkSpec

class XcorrBurstSpec extends SparkSpec {
  import spark.implicits._

  test("xcorr: correlogram sums, edge counts, and ranking") {
    // interleaved stream 1..8: x = (1,3,5,7), y = (2,4,6,8)
    val df = (1 to 8).map(i => (1L, i * 10L, i.toLong, i.toDouble))
      .toDF("user_id", "ts_us", "event_id", "value")
    val got = Xcorr
      .correlogram(df, Seq("user_id"), "ts_us", "event_id", "value", maxLag = 1)
      .collect()
      .map(r => r.getInt(1) -> (r.getDouble(2), r.getLong(3), r.getInt(4)))
      .toMap
    // r(0) = 1*2 + 3*4 + 5*6 + 7*8 = 100 (4 terms)
    assert(got(0) == (100.0, 4L, 1))
    // r(-1) = 3*2 + 5*4 + 7*6 = 68 (3 terms)
    assert(got(-1) == (68.0, 3L, 2))
    // r(+1) = 1*4 + 3*6 + 5*8 = 62 (3 terms)
    assert(got(1) == (62.0, 3L, 3))
  }

  test("xcorr: keys stay independent") {
    val df = Seq(
      (1L, 10L, 1L, 2.0), (1L, 20L, 2L, 3.0),
      (2L, 10L, 3L, 5.0), (2L, 20L, 4L, 7.0)
    ).toDF("user_id", "ts_us", "event_id", "value")
    val got = Xcorr
      .correlogram(df, Seq("user_id"), "ts_us", "event_id", "value", maxLag = 0)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 6.0 && got(2L) == 35.0)
  }

  test("burst: hysteresis merge and min-duration gate") {
    // 0/10 pattern: mu = 3, sigma = sqrt(21) ~ 4.58; lo ~ 5.29, hi ~ 7.58
    val vals = Seq(0, 10, 10, 0, 0, 10, 0, 0, 0, 10)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, (i + 1) * 100L, (i + 1).toLong, v.toDouble)
    }.toDF("user_id", "ts_us", "event_id", "value")
    // islands rn 2-3, rn 6, rn 10; gap(3->6) = 2 < 3 merges; rn 10
    // stays alone and drops under minSamples = 2
    val got = Burst.detect(df, Seq("user_id"), "ts_us", "event_id", "value",
      kHi = 1.0, kLo = 0.5, mergeGapSamples = 3L, minSamples = 2L).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(1) == 1) // event_seq
    assert(r.getLong(2) == 200L && r.getLong(3) == 600L)
    assert(r.getLong(4) == 5L)
    assert(r.getDouble(5) == 10.0)
  }

  test("burst: low-only islands never qualify") {
    // mu = 2.2, sigma ~ 3.52; kLo = 1 flags 10 and the 6s, kHi = 2
    // (hi ~ 9.23) only the 10 — the 6,6 island drops
    val vals = Seq(0, 0, 10, 0, 0, 6, 6, 0, 0, 0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, (i + 1) * 100L, (i + 1).toLong, v.toDouble)
    }.toDF("user_id", "ts_us", "event_id", "value")
    val got = Burst.detect(df, Seq("user_id"), "ts_us", "event_id", "value",
      kHi = 2.0, kLo = 1.0, mergeGapSamples = 1L, minSamples = 1L).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 300L && got.head.getLong(4) == 1L)
    assert(got.head.getDouble(5) == 10.0)
  }

  test("burst: flat signal (sigma 0) yields no events") {
    val df = (1 to 6).map(i => (1L, i * 100L, i.toLong, 5.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val got = Burst.detect(df, Seq("user_id"), "ts_us", "event_id", "value",
      kHi = 2.0, kLo = 1.0, mergeGapSamples = 1L, minSamples = 1L).collect()
    assert(got.isEmpty) // v > mu + 0 is false everywhere
  }
}
