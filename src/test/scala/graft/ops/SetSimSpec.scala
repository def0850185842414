package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SetSim]] — exact prefix-filtered Jaccard self-join: completeness
  * vs brute force is the whole point (LSH may miss pairs; this must
  * not). */
class SetSimSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def toksDf(rows: Seq[(Long, Seq[String])]) =
    rows.toDF("id", "toks")

  test("known fixture: boundary pair at exactly t kept, below-t dropped") {
    val df = toksDf(Seq(
      1L -> Seq("a", "b", "c", "d", "e", "f", "g"),          // m=7
      2L -> Seq("a", "b", "c", "d", "e", "f", "z"),          // inter 6, uni 8 → 0.75
      3L -> Seq("a", "b", "c", "x", "y", "z", "w"),          // vs 1: inter 3, uni 11 → 0.27
      4L -> Seq("a", "b", "c", "d", "e", "f", "g")           // identical to 1 → 1.0
    ))
    val got = SetSim.jaccardSelfJoin(df, "id", "toks", 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 2L) -> ((6L, 8L)),    // exactly t=0.75: 4·6 ≥ 3·8 — integer boundary kept
      (1L, 4L) -> ((7L, 7L)),
      (2L, 4L) -> ((6L, 8L))))
  }

  test("completeness vs brute force on a generated corpus, across thresholds") {
    // 120 sets over a 40-token universe, sizes 3..10 — dense overlap
    val rows = (0L until 120L).map { i =>
      val m = 3 + (i % 8).toInt
      i -> (0 until m).map(j => s"t${(i * 7 + j * j) % 40}").distinct
    }
    val df = toksDf(rows)
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val got = SetSim.jaccardSelfJoin(df, "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // brute force in scala
      val sets = rows.map { case (i, ts) => i -> ts.toSet }.toMap
      val (num, den) = (BigDecimal(t) * 10).toLong -> 10L
      val expect = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size.toLong
        uni = (sets(a) | sets(b)).size.toLong
        if den * inter >= num * uni
      } yield (a, b, inter, uni)).toSet
      assert(got == expect, s"t=$t: got ${got.size}, expected ${expect.size}")
    }
  }

  test("duplicate and empty tokens normalized; empty sets dropped") {
    val df = toksDf(Seq(
      1L -> Seq("a", "a", "b", "", "b"),
      2L -> Seq("b", "a"),
      3L -> Seq("", "")))
    val got = SetSim.jaccardSelfJoin(df, "id", "toks", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 2L)))   // both are {a,b}
  }

  test("over-cap prefix buckets shed with the diagnostic reporting them") {
    // 50 identical sets: every prefix bucket holds all 50 ids
    val df = toksDf((0L until 50L).map(i => i -> Seq("x", "y", "z")))
    val capped = SetSim.jaccardSelfJoin(df, "id", "toks", 0.9, maxBucket = 10)
    assert(capped.count() == 0)
    val shed = SetSim.prefixShed(df, "id", "toks", 0.9, maxBucket = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shed.values.forall(_ == 50L), shed.toString)
    assert(shed.nonEmpty)
    // with the default cap the same corpus is exact: all 50·49/2 pairs
    val full = SetSim.jaccardSelfJoin(df, "id", "toks", 0.9)
    assert(full.count() == 50L * 49 / 2)
  }

  test("driver fast path equals the distributed lane (r18), caps included") {
    // the gate keys on autoBroadcastJoinThreshold: default → driver
    // path for these tiny corpora; -1 → distributed lane
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val rows = (0L until 150L).map { i =>
      val m = 3 + (i % 9).toInt
      i -> (0 until m).map(j => s"t${(i * 11 + j * 3) % 60}").distinct
    }
    val df = toksDf(rows)
    def run(t: Double, cap: Int) = SetSim.jaccardSelfJoin(df, "id", "toks", t, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    try {
      for ((t, cap) <- Seq((0.5, 4096), (0.7, 4096), (0.9, 3))) {
        val fast = run(t, cap)
        spark.conf.set(key, "-1")
        val dist = run(t, cap)
        spark.conf.set(key, saved)
        assert(fast == dist, s"t=$t cap=$cap: ${fast.size} vs ${dist.size}")
      }
    } finally spark.conf.set(key, saved)
  }
}
