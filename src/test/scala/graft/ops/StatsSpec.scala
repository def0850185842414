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

  test("chiSquared: hand-computed 2x2, per-cell 6dp micro terms summed exactly") {
    // counts x1=2 x2=1 y1=1 y2=2, N=6, every e=1.5: true chi2 = 2/3;
    // per cell (o·6−9)²·1e6/54 = 166666.67 → half-up 166667, ×4 = 666668
    val df = Seq(("x", 1), ("x", 1), ("x", 2), ("y", 1), ("y", 2), ("y", 2))
      .toDF("a", "b")
    val r = Stats.chiSquared(df, "a", "b", critMicro = 3841459L).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L) // dof
    assert(r.getDouble(4) == 0.666668, r.toString)
    assert(r.getInt(5) == 0) // 0.666668 < 3.841459
    assert(r.getDouble(6) == 1.5) // min expected
    assert(r.getInt(7) == 0) // Cochran: 1.5 < 5
  }

  test("chiSquared: zero-observed cells still contribute expected mass") {
    // only (x,1) and (y,2) observed: e=1 everywhere, chi2 = 4 exactly
    val df = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2)).toDF("a", "b")
    val r = Stats.chiSquared(df, "a", "b", critMicro = 3841459L).head()
    assert(r.getDouble(4) == 4.0, r.toString)
    assert(r.getInt(5) == 1) // 4 > 3.841459
  }

  test("chiSquared: independent uniform table has zero statistic") {
    val df = (for { a <- Seq("x", "y"); b <- 1 to 3; _ <- 1 to 4 } yield (a, b))
      .toDF("a", "b")
    val r = Stats.chiSquared(df, "a", "b", critMicro = 1L).head()
    assert(r.getDouble(4) == 0.0 && r.getInt(5) == 0)
    assert(r.getLong(3) == 2L) // dof (2−1)(3−1)
    assert(r.getInt(7) == 0) // e = 4 < 5
  }

  test("benford: digits from cent strings; missing digits densified; chi2 is the micro sum") {
    // 1.00 1.50 19.99 2.00 2.50 30.00 -4.00 → digits 1,1,1,2,2,3,4 (0/null skipped)
    val df = Seq[java.lang.Double](1.00, 1.50, 19.99, 2.00, 2.50, 30.00, 0.00, null, -4.00)
      .toDF("v")
    val rows = Stats.benford(df, "v").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    assert(rows.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L, 1L, 0L, 0L, 0L, 0L, 0L))
    val d1 = rows.head
    assert(d1.getDouble(2) == 0.428571) // half-up 3e6/7
    assert(d1.getDouble(3) == 0.30103)
    assert(d1.getDouble(4) == 2.10721) // 301030·7/1e6
    // an unobserved digit contributes exactly its expected micro mass
    val d9 = rows.last
    assert(d9.getDouble(5) == 0.320299, d9.toString) // 45757·7/1e6
    // the corpus chi2 equals the exact micro sum of the 9 terms
    val micro = rows.map(r => math.rint(r.getDouble(5) * 1e6).toLong).sum
    assert(rows.forall(r => r.getDouble(6) == micro / 1e6))
  }

  test("benford: when-chain digit == substring digit across every magnitude (r19)") {
    // cents span 1 .. ~1e16 (decimal(18,2) ceiling); cover each decade
    // with a leading digit 1..9 plus the decade boundaries themselves
    val vals = for {
      exp <- 0 to 14
      lead <- 1 to 9
    } yield lead * math.pow(10.0, exp) / 100.0 + (if (exp > 2) 0.13 else 0.0)
    val df = vals.map(java.lang.Double.valueOf).toDF("v")
    import org.apache.spark.sql.functions._
    val cents = abs(col("v").cast("decimal(18,2)") * 100).cast("long")
    val expected = df.select(cents.as("__c"))
      .where(col("__c").isNotNull && col("__c") > 0L)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Stats.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).filter(_._2 > 0).toMap
    assert(got == expected)
  }

  test("concentration: hand-computed gini/hhi/top share") {
    // counts per key: a=4, b=1, c=1 → asc [1,1,4]:
    // gini = (−2·1 + 0·1 + 2·4)/(3·6) = 1/3, hhi = 18/36, top2 = 5/6
    val df = (Seq.fill(4)("a") ++ Seq("b", "c")).toDF("k")
    val r = Stats.concentration(df, "k", topK = 2).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 0.333333)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.833333)
  }

  test("psi: hand-computed 2-bin shift, clamped empty side, decimal-exact alert") {
    // A = {1,1,2,2}, B = {2,2,3,3}, 2 baseline-median bins:
    // v=1→bin0 (na=2, nb=0), v=2,3→bin1 (na=2, nb=4)
    val df = (Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 2.0)) ++
      Seq(("b", 2.0), ("b", 2.0), ("b", 3.0), ("b", 3.0))).toDF("g", "v")
    val rows = Stats.psi(df, "g", "v", "a", "b", nBins = 2).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 0L)
    assert(rows(1).getLong(1) == 2L && rows(1).getLong(2) == 4L)
    def term12(pa: Double, pb: Double): BigDecimal =
      BigDecimal((pa - pb) * math.log(pa / pb)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val t0 = term12(0.5, 1e-6); val t1 = term12(0.5, 1.0)
    assert(rows(0).getDouble(5) == t0.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val want = (t0 + t1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_.getDouble(6) == want), rows.mkString(";"))
    assert(rows.forall(_.getInt(7) == 1)) // way past 0.2
  }

  test("psi: identical distributions score zero, no alert") {
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val df = (vs.map(("a", _)) ++ vs.map(("b", _))).toDF("g", "v")
    val rows = Stats.psi(df, "g", "v", "a", "b", nBins = 5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(6) == 0.0 && r.getInt(7) == 0))
    assert(rows.forall(r => r.getDouble(3) == r.getDouble(4)))
  }

  test("entropy: uniform group hits ln(k); single-value group is zero with NULL norm") {
    val df = (Seq("a", "b", "c", "d").map(("u", _)) ++ Seq(("m", "x"), ("m", "x")))
      .toDF("k", "v")
    val got = Stats.entropy(df, Seq("k"), "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    val ln4 = BigDecimal(4 * ((0.25: Double) * math.log(4.0) match {
      case t => BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    })).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("u")._1 == 4L && got("u")._2 == 4L)
    assert(got("u")._3 == ln4 && got("u")._4 == 1.0, got.toString)
    assert(got("m") == ((2L, 1L, 0.0, null)))
  }

  test("entropy: skewed mix lands between 0 and ln(k)") {
    val df = (Seq.fill(9)(("s", "hot")) ++ Seq(("s", "rare"))).toDF("k", "v")
    val r = Stats.entropy(df, Seq("k"), "v").head()
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < math.log(2.0))
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
  }

  test("linearFit: perfect line recovers slope/intercept, r2 = 1") {
    val df = (1 to 5).map(i => ("g", i.toDouble, 2.0 * i + 1)).toDF("k", "x", "y")
    val r = Stats.linearFit(df, Seq("k"), "x", "y").head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("linearFit: constant x is degenerate (NULLs); constant y fits slope 0, NULL r2") {
    val cx = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("k", "x", "y")
    val r1 = Stats.linearFit(cx, Seq("k"), "x", "y").head()
    assert(r1.isNullAt(2) && r1.isNullAt(3) && r1.isNullAt(4))
    val cy = Seq(("g", 1.0, 3.0), ("g", 2.0, 3.0)).toDF("k", "x", "y")
    val r2 = Stats.linearFit(cy, Seq("k"), "x", "y").head()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 3.0 && r2.isNullAt(4))
  }

  test("groupQuantiles: exact type-1 picks per group, integer boundary") {
    // group g: values 1..10 → p50 = 5 (cum 5·2 ≥ 10), p90 = 9, p99 = 10
    // group h: 1,1,1,2 → p50 = 1 (cum 3·2 ≥ 4·1), p90 = 2 (3·10 < 36), p99 = 2
    val df = ((1 to 10).map(i => ("g", i.toDouble)) ++
      Seq(("h", 1.0), ("h", 1.0), ("h", 1.0), ("h", 2.0))).toDF("k", "v")
    val rows = Stats.groupQuantiles(df, "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows(0) == (("g", 10L, 5.0, 9.0, 10.0)))
    assert(rows(1) == (("h", 4L, 1.0, 2.0, 2.0)))
  }

  test("groupQuantiles: custom rationals; p100 is the max") {
    val df = Seq(("g", 1.5), ("g", 2.5), ("g", 3.5)).toDF("k", "v")
    val r = Stats.groupQuantiles(df, "k", "v",
      probs = Seq(("p33", 1L, 3L), ("p100", 1L, 1L))).head()
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 3.5)
  }

  test("concentration: perfectly equal keys have zero gini, 1/n hhi") {
    val df = (1 to 5).flatMap(k => Seq.fill(3)(s"k$k")).toDF("k")
    val r = Stats.concentration(df, "k", topK = 10).head()
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.2)
    assert(r.getDouble(4) == 1.0) // topK ≥ n_keys → everything
  }
}
