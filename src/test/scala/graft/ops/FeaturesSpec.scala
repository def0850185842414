package graft.ops

import graft.SparkSpec

/** [[Features]] — point-in-time correctness is the whole contract:
  * the trailing frame must exclude the current row AND its timestamp
  * ties, and the LOO encoding must never see its own label. */
class FeaturesSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("trailing: strictly-prior range frame — ties excluded, horizon edge inclusive") {
    val ev = Seq(
      // user a: ts 100 (v=1), 200 (v=2), 200 (v=4, tie), 300 (v=8)
      ("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 200L, 4.0), ("a", 300L, 8.0),
      // user b: isolated
      ("b", 250L, 16.0)
    ).toDF("k", "ts", "v")
    val got = Features.trailing(ev, Seq("k"), "ts", "v", lookbackUs = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getLong(3), Option(r.getDecimal(4)).map(_.doubleValue), Option(r.get(5)))))
      .toMap
    assert(got(("a", 100L, 1.0))._1 == 0L)                 // nothing prior
    assert(got(("a", 200L, 2.0)) == ((1L, Some(1.0), Some(1.0))))  // sees ts=100 only, NOT its tie
    assert(got(("a", 200L, 4.0)) == ((1L, Some(1.0), Some(1.0))))  // ties symmetric
    assert(got(("a", 300L, 8.0)) == ((2L, Some(6.0), Some(3.0))))  // [200, 299]: both ties, not ts=100
    assert(got(("b", 250L, 16.0))._1 == 0L)                // keys isolated
  }

  test("quantileBin: balanced bins on uniform data, nulls null, error bound one bucket") {
    val df = spark.range(0, 10000).select(
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("id").cast("double").as("v"))
    val binned = Features.quantileBin(df, "v", nBins = 4)
    val sizes = binned.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    // equal-frequency up to one histogram bucket (10000/1000 = 10 rows)
    sizes.values.foreach(n => assert(math.abs(n - 2500L) <= 10L, sizes.toString))
    // nulls bin to null
    import spark.implicits._
    val withNull = Seq(Some(1.0), None, Some(2.0), Some(3.0)).toDF("v")
    val nb = Features.quantileBin(withNull, "v", nBins = 2).where($"v".isNull)
    assert(nb.head().isNullAt(1))
  }

  test("targetEncodeLoo: own label excluded, singleton category null") {
    val df = Seq(
      (1L, "x", 10.0), (2L, "x", 20.0), (3L, "x", 30.0),
      (4L, "solo", 99.0)
    ).toDF("id", "cat", "y")
    // the equi-join moves the cat key to column 0
    val got = Features.targetEncodeLoo(df, "cat", "y")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), Option(r.get(4))))).toMap
    assert(got(1L) == ((3L, Some(25.0))))   // (20+30)/2
    assert(got(2L) == ((3L, Some(20.0))))   // (10+30)/2
    assert(got(3L) == ((3L, Some(15.0))))   // (10+20)/2
    assert(got(4L) == ((1L, None)))         // nothing to borrow from
  }

  test("winsorize: tails clamp to the estimated cuts, middle and nulls ride through") {
    // 0..99: p05 cut ≈ 5-ish bucket edge, p95 ≈ 95-ish (uniform values
    // on 1024 buckets: estimator = lower edge of the qualifying bucket)
    val df = ((0 until 100).map(i => (i.toLong, java.lang.Double.valueOf(i.toDouble))) :+
      (999L, null.asInstanceOf[java.lang.Double])).toDF("id", "v")
    val got = Features.winsorize(df, "v", 0.05, 0.95, buckets = 1024)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    val clamped = got.collect { case (_, Some(d: Double)) => d }
    val lo = clamped.min
    val hi = clamped.max
    assert(lo > 0.0 && lo < 10.0, s"low cut $lo")
    assert(hi > 90.0 && hi < 99.0, s"high cut $hi")
    // the middle is untouched
    assert(got(50L).contains(50.0))
    // every tail value clamps exactly TO the cut, nulls ride through
    assert(got(0L).contains(lo) && got(99L).contains(hi))
    assert(got(999L).isEmpty)
  }
}
