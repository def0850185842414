package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTest: hand-computed D; small-n shift does not reject") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.333333) // max|F1-F2| = 1/3
    assert(r.getInt(4) == 0)
  }

  test("ksTest: fully separated large samples reject at alpha = 0.05") {
    val df = (Seq.fill(30)(("a", 1.0)) ++ Seq.fill(30)(("b", 2.0))).toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").head()
    assert(r.getDouble(2) == 1.0)
    // d_crit = sqrt(-ln(0.025)/2) * sqrt(60/900) ~ 0.3506
    assert(math.abs(r.getDouble(3) - 0.350615) < 1e-4, r.toString)
    assert(r.getInt(4) == 1)
  }

  test("ksTest: rows outside the two groups are ignored") {
    val df = Seq(("a", 1.0), ("b", 1.0), ("zzz", 99.0)).toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getDouble(2) == 0.0)
  }

  test("mannWhitney: tie-averaged ranks and tie-corrected z, hand-computed") {
    // A = {1, 2}, B = {2, 3}: R_a = 1 + 2.5 = 3.5, U_a = 0.5,
    // ties sum = 6, var = 4/12 * (5 - 6/12) = 1.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5)
    val wantZ = math.rint((0.5 - 2.0) / math.sqrt(1.5) * 1e6) / 1e6
    assert(r.getDouble(3) == wantZ, r.toString)
    assert(r.getInt(4) == 0)
  }

  test("mannWhitney: all-tied values -> zero variance -> NULL z") {
    val df = Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b").head()
    assert(r.isNullAt(3) && r.getInt(4) == 0)
    assert(r.getDouble(2) == 0.5) // U from the tied average rank 1.5
  }

  test("mannWhitney: a clean shift is significant at reasonable n") {
    val df = ((1 to 25).map(i => ("a", i.toDouble)) ++
      (1 to 25).map(i => ("b", i + 15.0))).toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b").head()
    assert(r.getInt(4) == 1, r.toString)
    assert(r.getDouble(3) < -1.96)
  }
}
