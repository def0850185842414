package graft.ts

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("weights: exact integer taps for alpha = 1/4, 8 taps") {
    val w = Ewma.weights(8, 1, 4)
    assert(w == Seq(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L))
    assert(Ewma.weights(2, 1, 2) == Seq(2L, 1L))
  }

  test("controlChart: hand-computed 2-tap chain, dev vs PRIOR ewma, alarm") {
    // alpha = 1/2, taps = 2 → weights [2, 1]; values 1.00, 2.00, 4.00:
    // s1 = 1.0; s2 = (2·200+100)/3 = 166667 micro-cents → 1.666667;
    // s3 = (2·400+200)/3 → 3.333333
    // dev2 = 2.00 − 1.0 = 1.0; dev3 = 4.00 − 1.666667 = 2.333333
    val df2 = Seq((1L, 10L, 1.00), (2L, 20L, 2.00), (3L, 30L, 4.00))
      .toDF("id", "ts", "v")
      .withColumn("k", org.apache.spark.sql.functions.lit("u"))
    val rows = Ewma
      .controlChart(df2, Seq("k"), "ts", "id", "v",
        taps = 2, alphaNum = 1, alphaDen = 2, thresholdMicro = 2000000L)
      .orderBy("ts")
      .select("n_taps", "ewma", "dev", "alarm")
      .collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getDouble(1) == 1.0)
    assert(rows(0).isNullAt(2) && rows(0).getInt(3) == 0)
    assert(rows(1).getInt(0) == 2 && rows(1).getDouble(1) == 1.666667)
    assert(rows(1).getDouble(2) == 1.0 && rows(1).getInt(3) == 0)
    assert(rows(2).getDouble(1) == 3.333333)
    assert(rows(2).getDouble(2) == 2.333333 && rows(2).getInt(3) == 1)
  }

  test("controlChart: keys are independent; ties broken by id") {
    val df = Seq(
      ("a", 1L, 1L, 10.0), ("a", 1L, 2L, 20.0), // tied ts → id order
      ("b", 1L, 3L, 5.0)
    ).toDF("k", "ts", "id", "v")
    val rows = Ewma
      .controlChart(df, Seq("k"), "ts", "id", "v",
        taps = 2, alphaNum = 1, alphaDen = 2, thresholdMicro = Long.MaxValue)
      .orderBy("k", "ts", "id")
      .collect()
    val byName = rows.map(r => (r.getAs[String]("k"), r.getAs[Long]("id"),
      r.getAs[Int]("n_taps"), r.getAs[Double]("ewma")))
    // a/id2 smooths over a/id1: (2·2000 + 1000)/3 = 1666.67 cents
    assert(byName(0) == (("a", 1L, 1, 10.0)))
    assert(byName(1) == (("a", 2L, 2, 16.666667)))
    assert(byName(2) == (("b", 3L, 1, 5.0))) // b never sees a's rows
  }

  test("controlChart: NULL values are excluded up front") {
    val df = Seq(
      ("a", 1L, 1L, Some(1.0)), ("a", 2L, 2L, None), ("a", 3L, 3L, Some(3.0))
    ).toDF("k", "ts", "id", "v")
    val rows = Ewma
      .controlChart(df, Seq("k"), "ts", "id", "v",
        taps = 2, alphaNum = 1, alphaDen = 2, thresholdMicro = Long.MaxValue)
      .orderBy("ts")
      .collect()
    assert(rows.length == 2)
    // the null row is gone; the survivor smooths over id1: (2·300+100)/3
    assert(rows(1).getAs[Double]("ewma") == 2.333333)
  }

  test("controlChart: negative values keep the sign-aware half-up exact") {
    val df = Seq(("a", 1L, 1L, -1.0), ("a", 2L, 2L, -2.0)).toDF("k", "ts", "id", "v")
    val rows = Ewma
      .controlChart(df, Seq("k"), "ts", "id", "v",
        taps = 2, alphaNum = 1, alphaDen = 2, thresholdMicro = 500000L)
      .orderBy("ts")
      .collect()
    assert(rows(0).getAs[Double]("ewma") == -1.0)
    // (2·(−200) + (−100))/3 = −166.667 cents → −1.666667
    assert(rows(1).getAs[Double]("ewma") == -1.666667)
    assert(rows(1).getAs[Double]("dev") == -1.0) // −2 − (−1)
    assert(rows(1).getAs[Int]("alarm") == 1)
  }

  test("controlChart: overflow guard rejects an unsafe taps/alphaDen pair") {
    val df = Seq(("a", 1L, 1L, 1.0)).toDF("k", "ts", "id", "v")
    intercept[IllegalArgumentException] {
      Ewma.controlChart(df, Seq("k"), "ts", "id", "v",
        taps = 20, alphaNum = 1, alphaDen = 10)
    }
  }
}
