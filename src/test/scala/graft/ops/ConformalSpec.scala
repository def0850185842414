package graft.ops

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = (s: String) => new java.math.BigDecimal(s)

  // nonconformities: 0.1,0.2,0.7,0.4,0.5,0.4,0.7,0.2,0.1 (n = 9)
  private val calib = Seq(
    (0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0),
    (0.4, 0), (0.3, 1), (0.2, 0), (0.1, 0)
  ).toDF("score", "label")

  test("qhat is the ceil((n+1)(1-alpha))-th smallest nonconformity") {
    val test = Seq(
      (0.95, 1), // set {1}, covered
      (0.35, 0), // set {0}, covered
      (0.5, 1), // empty set, not covered
      (0.6, 0) // set {1}, not covered
    ).toDF("score", "label")
    // alpha 0.5: k = ceil(10 * 0.5) = 5 -> 5th smallest = 0.4
    val r = Calibration.conformal(calib, test, "score", "label", alpha("0.5")).head()
    assert(r.getLong(0) == 9L)
    assert(r.getDouble(1) == 0.4)
    assert(r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.75)
  }

  test("k > n forces the full prediction set (qhat = 1)") {
    val smallCal = Seq((0.9, 1), (0.5, 0), (0.2, 0)).toDF("score", "label")
    val test = Seq((0.5, 1), (0.8, 0)).toDF("score", "label")
    // n = 3, alpha = 0.1: k = ceil(4 * 0.9) = 4 > 3
    val r = Calibration.conformal(smallCal, test, "score", "label", alpha("0.1")).head()
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(3) == 1.0) // everything covered
    assert(r.getDouble(4) == 2.0) // both labels in every set
  }

  test("marginal coverage holds on the oracle fixture (>= 1 - alpha - slack)") {
    // the q_conformal fixture at sf0.001: coverage must sit at or above
    // the conformal floor minus finite-sample slack
    val sc = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001").select(
      ((org.apache.spark.sql.functions.col("vec_id") % 101).cast("decimal(9,4)") / 100)
        .as("score"),
      org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("vec_id") % 3 === 0, 1)
        .otherwise(0).as("label"),
      org.apache.spark.sql.functions.col("vec_id"))
    val r = Calibration.conformal(
      sc.where(org.apache.spark.sql.functions.col("vec_id") % 2 === 0),
      sc.where(org.apache.spark.sql.functions.col("vec_id") % 2 === 1),
      "score", "label", alpha("0.1")).head()
    assert(r.getDouble(3) >= 0.85, s"coverage ${r.getDouble(3)} below conformal floor")
  }

  test("score outside [0,1] fails loud") {
    val bad = Seq((1.2, 1)).toDF("score", "label")
    val ex = intercept[Exception](
      Calibration.conformal(bad, calib, "score", "label", alpha("0.1")).collect())
    assert(ex.getMessage.contains("Calibration"))
  }
}
