package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench pass-budget gate — the logic whose absence
  * cost round 15 its BENCH artifact (5 unconditional passes outgrew
  * the driver's wall cap; rc 124, `parsed: null`). Pure function, no
  * Spark session.
  *
  * Round 17 rule: projection uses the MAX completed pass time (plan
  * warming makes every pass warm, so max ≈ min and nothing is
  * stranded; the max bounds worst-case measured-loop wall at
  * budget + one pass's own variance instead of budget + (max − min)),
  * against a 620 s default budget.
  */
class BenchGateSpec extends AnyFunSuite {

  test("repeat cap always wins: no pass past repeats even with infinite budget") {
    assert(!Bench.shouldContinue(5, 5, 10.0, 1.0, Double.MaxValue))
    assert(Bench.shouldContinue(4, 5, 10.0, 1.0, Double.MaxValue))
  }

  test("warmed 231-query passes at ~220 s vs a 620 s budget → 2 passes, stop before the 3rd only if it would overrun") {
    // all-warm passes (plan warm-up absorbed the cold tax): ~220 s each
    assert(Bench.shouldContinue(1, 5, 220.0, 220.0, 620.0)) // 440 ≤ 620 → pass 2
    assert(Bench.shouldContinue(2, 5, 400.0, 220.0, 620.0)) // 620 ≤ 620 → pass 3
    assert(!Bench.shouldContinue(3, 5, 620.0, 220.0, 620.0)) // 840 > 620 → stop
  }

  test("a fast suite still runs all repeats") {
    // 50 s/pass: 5 passes fit easily
    (1 to 4).foreach { p =>
      assert(Bench.shouldContinue(p, 5, 50.0 * p, 50.0, 620.0), s"pass $p")
    }
  }

  test("projection uses the MAX pass: worst-case wall is bounded by the budget plus one pass's variance") {
    // a disturbed 400 s pass raises the projection: 500 + 400 = 900 > 620
    // blocks the next pass even though the 220 s floor would fit —
    // artifact safety over pass count (the r16 worst case, budget −
    // min + max, could exceed the driver cap; the max-gate cannot)
    assert(!Bench.shouldContinue(2, 5, 500.0, 400.0, 620.0))
    // same elapsed with uniform 220 s passes: next pass fits, runs
    assert(Bench.shouldContinue(2, 5, 380.0, 220.0, 620.0)) // 600 ≤ 620
  }

  test("hot box (~1.4×, the 753 s re-run conditions): 310 s passes → exactly 2, wall ≈ budget") {
    assert(Bench.shouldContinue(1, 5, 310.0, 310.0, 620.0)) // 620 ≤ 620 → pass 2
    assert(!Bench.shouldContinue(2, 5, 620.0, 310.0, 620.0)) // 930 > 620 → stop
  }

  test("boundary: projection exactly at budget still runs (≤, not <)") {
    assert(Bench.shouldContinue(1, 5, 310.0, 310.0, 620.0))
    assert(!Bench.shouldContinue(1, 5, 310.0, 310.01, 620.0))
  }
}
