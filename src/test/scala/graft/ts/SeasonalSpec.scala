package graft.ts

import graft.SparkSpec

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("residuals: per-phase exact means, micro residuals, integer alarm boundary") {
    // binUs = 10, phases = 2: ts 5,25 → phase 0 (values 1, 2 → mean 1.5);
    // ts 15,35 → phase 1 (values 3, 5 → mean 4.0)
    val df = Seq(
      ("k", 5L, 1.00), ("k", 15L, 3.00), ("k", 25L, 2.00), ("k", 35L, 5.00)
    ).toDF("k", "ts", "v")
    val rows = Seasonal
      .residuals(df, Seq("k"), "ts", "v", binUs = 10L, phases = 2,
        thresholdMicro = 600000L)
      .orderBy("ts")
      .select("phase", "n_phase", "expected", "residual", "alarm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 1.5, -0.5, 0),
      (1L, 2L, 4.0, -1.0, 1),
      (0L, 2L, 1.5, 0.5, 0),
      (1L, 2L, 4.0, 1.0, 1)))
  }

  test("residuals: non-terminating mean is the 6dp half-up; keys are independent") {
    // key a phase 0: 1.00, 2.00, 2.00 → 5/3 = 1.666667
    val df = Seq(
      ("a", 1L, 1.00), ("a", 21L, 2.00), ("a", 41L, 2.00),
      ("b", 1L, 9.00)
    ).toDF("k", "ts", "v")
    val rows = Seasonal
      .residuals(df, Seq("k"), "ts", "v", binUs = 10L, phases = 2,
        thresholdMicro = Long.MaxValue)
      .orderBy("k", "ts").collect()
    assert(rows(0).getAs[Double]("expected") == 1.666667)
    assert(rows(0).getAs[Double]("residual") == -0.666667)
    assert(rows(3).getAs[String]("k") == "b" && rows(3).getAs[Double]("expected") == 9.0)
  }

  test("residuals: NULL values are excluded; negative values keep sign-aware exactness") {
    val df = Seq(
      ("a", 1L, Some(-3.00)), ("a", 21L, Some(-4.00)), ("a", 41L, None)
    ).toDF("k", "ts", "v")
    val rows = Seasonal
      .residuals(df, Seq("k"), "ts", "v", binUs = 10L, phases = 2,
        thresholdMicro = 400000L)
      .orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("expected") == -3.5)
    assert(rows(0).getAs[Double]("residual") == 0.5)
    assert(rows(0).getAs[Int]("alarm") == 1)
  }
}
