package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Resample.ohlc]] — the open/close argmin/argmax must be
  * partition-order-free, the mean integer-exact. */
class ResampleSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("ohlc: bucket edges, open/close by ts, exact decimal stats") {
    val ev = Seq(
      // key a, bucket [0, 100): ts 10 → 5.00, ts 50 → 1.25, ts 99 → 3.50
      ("a", 10L, 5.00), ("a", 50L, 1.25), ("a", 99L, 3.50),
      // key a, bucket [100, 200): single event exactly on the edge
      ("a", 100L, 7.00),
      // key b, same buckets must not merge with a
      ("b", 10L, -2.00), ("b", 20L, -4.00)
    ).toDF("k", "ts", "v")
    val got = Resample.ohlc(ev, Seq("k"), "ts", "v", bucketUs = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((
        r.getLong(2),
        r.getDecimal(3).doubleValue, r.getDecimal(4).doubleValue,
        r.getDecimal(5).doubleValue, r.getDecimal(6).doubleValue,
        r.getDecimal(7).doubleValue, r.getDouble(8))))
      .toMap
    assert(got(("a", 0L)) == ((3L, 5.00, 3.50, 5.00, 1.25, 9.75, 3.25)))
    assert(got(("a", 100L)) == ((1L, 7.00, 7.00, 7.00, 7.00, 7.00, 7.0)))
    assert(got(("b", 0L)) == ((2L, -2.00, -4.00, -2.00, -4.00, -6.00, -3.0)))
  }

  test("ohlc: partition-order-free (repartitioned input, same result)") {
    val ev = spark.range(0, 10000).select(
      (col("id") % 13).cast("string").as("k"),
      col("id").as("ts"),
      (col("id") % 97).cast("double").as("v"))
    val a = Resample.ohlc(ev, Seq("k"), "ts", "v", 1000L)
    val b = Resample.ohlc(ev.repartition(17), Seq("k"), "ts", "v", 1000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ohlc: mean is integer-exact HALF-UP at the 6dp boundary") {
    // sum = 0.01 over n = 32 → 10000/32 = 312.5 micro-units: half-up
    // gives 313 (0.000313); banker's rounding would give 312.
    val ev = ((1L to 31L).map(ts => ("a", ts, 0.00)) :+ (("a", 32L, 0.01)))
      .toDF("k", "ts", "v")
    val m = Resample.ohlc(ev, Seq("k"), "ts", "v", 1000L)
      .select("vmean").head().getDouble(0)
    assert(m == 0.000313, s"got $m")
  }
}
