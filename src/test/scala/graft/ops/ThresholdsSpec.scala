package graft.ops

import graft.SparkSpec

class ThresholdsSpec extends SparkSpec {
  import spark.implicits._

  // scores 0.9/0.7/0.5/0.3 with precisions 1.0, 0.75, 0.6, 0.5 cumul.
  private val rows = Seq(
    (0.9, 1), (0.9, 1), // cum 2/2 = 1.0
    (0.7, 1), (0.7, 0), // cum 3/4 = 0.75
    (0.5, 0), (0.5, 0), (0.5, 1), (0.5, 1), (0.5, 0), (0.5, 1), // cum 6/10 = 0.6
    (0.3, 0), (0.3, 0) // cum 6/12 = 0.5
  ).toDF("score", "label")

  test("picks the lowest threshold (max recall) meeting the target") {
    val got = Thresholds.precisionThreshold(rows, "score", "label", 750000L).head()
    assert(got.getDouble(0) == 0.7)
    assert(got.getLong(1) == 4L && got.getLong(2) == 3L)
    assert(got.getDouble(3) == 0.75)
    assert(got.getDouble(4) == 0.5) // 3 of 6 positives kept
  }

  test("non-monotone precision: a later threshold can requalify") {
    // at 0.6 target: 0.5 qualifies (0.6 >= 0.6) even though 0.75 > 0.6
    // at 0.7; the op must keep scanning past the 0.7 dip... and return
    // the LOWEST qualifying threshold
    val got = Thresholds.precisionThreshold(rows, "score", "label", 600000L).head()
    assert(got.getDouble(0) == 0.5)
    assert(got.getLong(1) == 10L && got.getLong(2) == 6L)
  }

  test("unreachable target returns zero rows") {
    val got = Thresholds.precisionThreshold(rows, "score", "label", 1000001L - 1)
    // target 1.0 reachable only at 0.9 here
    assert(got.head().getDouble(0) == 0.9)
    val none = Thresholds.precisionThreshold(
      Seq((0.5, 0)).toDF("score", "label"), "score", "label", 500000L)
    assert(none.count() == 0)
  }

  test("exact boundary: integer cross-multiply, no float epsilon") {
    // precision exactly 2/3 vs target 666667 micro: 2*1e6 < 666667*3
    // (2000000 < 2000001) -> excluded; vs 666666: included
    val df = Seq((0.8, 1), (0.8, 1), (0.8, 0)).toDF("score", "label")
    assert(Thresholds.precisionThreshold(df, "score", "label", 666667L).count() == 0)
    assert(Thresholds.precisionThreshold(df, "score", "label", 666666L).head().getDouble(0) == 0.8)
  }
}
