package graft.ops

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the pooled two-proportion z. */
  private def refZ(c1: Long, n1: Long, c2: Long, n2: Long): Double = {
    val p1 = c1.toDouble / n1
    val p2 = c2.toDouble / n2
    val p = (c1 + c2).toDouble / (n1 + n2)
    val se = math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    BigDecimal((p1 - p2) / se).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("abTest: counts, rates, pooled z vs control, significance flag") {
    // control: 40/400; treatment: 80/400 (clearly significant);
    // noise: 42/400 (clearly not)
    val rows =
      (0 until 400).map(i => ("control", if (i < 40) 1 else 0)) ++
        (0 until 400).map(i => ("treat", if (i < 80) 1 else 0)) ++
        (0 until 400).map(i => ("noise", if (i < 42) 1 else 0))
    val got = Experiment
      .abTest(rows.toDF("variant", "converted"), "variant", "converted", "control")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getInt(5)))
      .toMap
    assert(got("control") == ((400L, 40L, 0.1, None, 0)))
    val (nT, cT, rateT, zT, sigT) = got("treat")
    assert((nT, cT, rateT) == ((400L, 80L, 0.2)))
    assert(zT.contains(refZ(80, 400, 40, 400)))
    assert(sigT == 1)
    val (_, _, _, zN, sigN) = got("noise")
    assert(zN.contains(refZ(42, 400, 40, 400)))
    assert(sigN == 0)
  }

  test("abTest: degenerate arms — zero pooled variance gives NULL z, not NaN") {
    val rows = Seq(("control", 0), ("control", 0), ("b", 0), ("b", 0))
    val got = Experiment
      .abTest(rows.toDF("variant", "converted"), "variant", "converted", "control")
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(got == Map("control" -> true, "b" -> true))
  }

  test("abTest: boolean conversion column casts like 0/1") {
    val rows = Seq(("control", true), ("control", false), ("t", true), ("t", true))
    val got = Experiment
      .abTest(rows.toDF("variant", "converted"), "variant", "converted", "control")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("control" -> 1L, "t" -> 2L))
  }

  test("cuped: perfectly correlated covariate adjusts both arms to the pooled mean") {
    val rows = Seq(("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 5.0, 5.0), ("b", 7.0, 7.0))
    val got = Experiment
      .cuped(rows.toDF("variant", "y", "x"), "variant", "y", "x")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // theta = 1, rho2 = 1; both arms adjust to the pooled mean 4
    assert(got("a") == ((2.0, 4.0, 1.0, 1.0)))
    assert(got("b") == ((6.0, 4.0, 1.0, 1.0)))
  }

  test("cuped: constant covariate degrades to unadjusted means (NULL theta)") {
    val rows = Seq(("a", 1.0, 5.0), ("a", 3.0, 5.0), ("b", 7.0, 5.0))
    val got = Experiment
      .cuped(rows.toDF("variant", "y", "x"), "variant", "y", "x")
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3)) // mean_adj == mean_y
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("sprt: integer llr chain crosses the Wald boundaries, hand-computed") {
    // p0=0.1 p1=0.3 α=.05 β=.2: L1=ln3≈1.098612, L0=ln(7/9)≈−0.251314,
    // upper=ln16≈2.772589, lower=ln(0.2/0.95)≈−1.558145
    val rows =
      (Seq.fill(5)(("hot", 1)) ++ Seq.fill(5)(("hot", 0)) ++      // llr 4.23649 → H1
        Seq.fill(10)(("cold", 0)) ++                              // llr −2.51314 → H0
        Seq(("mid", 1)) ++ Seq.fill(4)(("mid", 0)))               // llr 0.093356 → continue
    val got = Experiment
      .sprt(rows.toDF("variant", "conv"), "variant", "conv", p0 = 0.1, p1 = 0.3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got("hot") == ((10L, 5L, 4.23649, "accept_h1")), got.toString)
    assert(got("cold") == ((10L, 0L, -2.51314, "accept_h0")))
    assert(got("mid") == ((5L, 1L, 0.093356, "continue")))
  }

  test("sprt: boundary equality decides (>= upper accepts), not drifts") {
    // design the counts so llrMicro lands EXACTLY on the upper literal:
    // with p0=0.25, p1=0.75: L1 = ln3 micro = 1098612, L0 = −1098612;
    // upper = ln16 = 2772589 — not an exact multiple, so instead pin
    // the semantics on lower: conv=0, n chosen so llr just crosses
    val df = Seq.fill(2)(("a", 0)).toDF("variant", "conv")
    val r = Experiment.sprt(df, "variant", "conv", p0 = 0.25, p1 = 0.75,
      alpha = 0.05, beta = 0.2).head()
    // llr = 2·(−1098612) = −2197224; lower = ln(0.2/0.95)·1e6 = −1558145
    assert(r.getString(4) == "accept_h0" && r.getDouble(3) == -2.197224)
  }
}
