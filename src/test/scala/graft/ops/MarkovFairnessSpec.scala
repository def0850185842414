package graft.ops

import graft.SparkSpec

class MarkovFairnessSpec extends SparkSpec {
  import spark.implicits._

  // one user, two sessions (gap 100 cuts at ts 1000): a→b→a | a→c
  // second user: b→b
  private val ev = Seq(
    (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
    (1L, 1000L, 4L, "a"), (1L, 1010L, 5L, "c"),
    (2L, 10L, 6L, "b"), (2L, 20L, 7L, "b")
  ).toDF("user_id", "ts_us", "event_id", "event_type")

  test("markov: transitions never cross the session gap; probs row-normalize") {
    val got = Markov
      .transitions(ev, Seq("user_id"), "ts_us", "event_id", "event_type", gapUs = 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // from a: a→b (1), a→c (1) — the a(ts 30) → a(ts 1000) pair is cut
    assert(got(("a", "b")) == (1L, 0.5))
    assert(got(("a", "c")) == (1L, 0.5))
    assert(got(("b", "a")) == (1L, 0.5))
    assert(got(("b", "b")) == (1L, 0.5))
    assert(got.size == 4)
  }

  test("markov: ties within a timestamp order by the tie column") {
    val tied = Seq(
      (1L, 10L, 2L, "y"), (1L, 10L, 1L, "x"), (1L, 10L, 3L, "z")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Markov
      .transitions(tied, Seq("user_id"), "ts_us", "event_id", "event_type", gapUs = 100L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }

  test("fairness: rates, gaps, and DI ratios from exact counts") {
    val df = Seq(
      ("en", 1), ("en", 1), ("en", 0), ("en", 0), // rate 0.5
      ("de", 1), ("de", 0), ("de", 0), ("de", 0) // rate 0.25
    ).toDF("lang", "flag")
    val got = Fairness.parityReport(df, "lang", "flag")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    // overall rate 3/8 = 0.375
    assert(got("en") == (4L, 2L, 0.5, 0.125, round6(0.5 / 0.375)))
    assert(got("de") == (4L, 1L, 0.25, -0.125, round6(0.25 / 0.375)))
  }

  test("fairness: zero passes overall -> NULL DI ratio, zero rates") {
    val df = Seq(("en", 0), ("de", 0)).toDF("lang", "flag")
    val rows = Fairness.parityReport(df, "lang", "flag").collect()
    assert(rows.forall(r => r.getDouble(3) == 0.0 && r.isNullAt(5)))
  }

  test("fairness: NULL group fails loud") {
    val df = Seq((Option.empty[String], 1), (Some("en"), 0)).toDF("lang", "flag")
    val ex = intercept[Exception](Fairness.parityReport(df, "lang", "flag").collect())
    assert(ex.getMessage.contains("Fairness"))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
