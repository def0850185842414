package graft.spikes

import graft.SparkSpec

class SpikesSpec extends SparkSpec {
  import spark.implicits._

  // censor docstring fixture (jagular/spikes.py:322-327):
  // [110,111,112,120,270,271,280], width=30 → [110,270]
  test("censor keeps first event then drops within width of last KEPT") {
    val df = Seq(110L, 111L, 112L, 120L, 270L, 271L, 280L).toDF("idx")
    val out = Spikes.censor(df, "idx", width = 30L, keys = Nil)
      .orderBy("idx").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(110L, 270L))
  }

  test("censor resets state per key") {
    val df = Seq(("a", 0L), ("a", 10L), ("a", 40L), ("b", 11L), ("b", 12L))
      .toDF("k", "idx")
    val out = Spikes.censor(df, "idx", width = 30L, keys = Seq("k"))
      .orderBy("k", "idx").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 0L), ("a", 40L), ("b", 11L)))
  }

  test("crossings requires two consecutive samples past threshold") {
    // x > 5 at idx 2,3 (consecutive → crossing at 2) and idx 6 (isolated)
    val df = Seq((0L, 0.0), (1L, 1.0), (2L, 9.0), (3L, 8.0), (4L, 0.0),
      (5L, 1.0), (6L, 7.0), (7L, 2.0)).toDF("idx", "v")
    val out = Spikes.crossings(df, "idx", "v", 5.0, "pos")
      .orderBy("idx").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L))
  }

  test("crossings neg polarity mirrors the reference") {
    val df = Seq((0L, 0.0), (1L, -9.0), (2L, -8.0), (3L, 0.0)).toDF("idx", "v")
    val out = Spikes.crossings(df, "idx", "v", 5.0, "neg")
      .orderBy("idx").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L))
  }

  test("madThreshold matches hand-computed MAD rule") {
    // abs values 1..5 → median 3 → thr = 2 * 3/0.6745
    val df = Seq(1.0, -2.0, 3.0, -4.0, 5.0).toDF("v")
    val thr = Spikes.madThreshold(df, "v", 2.0).first().getDouble(0)
    assert(math.abs(thr - 2.0 * (3.0 / 0.6745)) < 1e-12)
  }

  test("extractPatches gathers half-open window around each peak") {
    val samples = (0L to 9L).map(i => (i, i.toDouble)).toDF("idx", "v")
    val peaks = Seq(5L).toDF("idx")
    val out = Spikes.extractPatches(samples, peaks, "idx", "v", halfWidth = 2)
      .orderBy("offset").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((-2L, 3.0), (-1L, 4.0), (0L, 5.0), (1L, 6.0)))
  }

  test("keyed extractPatches gathers per channel only (no cross-channel bleed)") {
    val samples = (for (ch <- 0 to 1; i <- 0L to 9L)
      yield (ch, i, (ch * 100 + i).toDouble)).toDF("channel", "idx", "v")
    val peaks = Seq((0, 5L), (1, 7L)).toDF("channel", "idx")
    val out = Spikes
      .extractPatches(samples, peaks, "idx", "v", halfWidth = 1, keys = Seq("channel"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      (0, 5L, -1L, 4.0), (0, 5L, 0L, 5.0),    // channel 0 peak: own samples only
      (1, 7L, -1L, 106.0), (1, 7L, 0L, 107.0) // channel 1 peak: own samples only
    ))
  }
}
