package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench pass-budget gate — the logic whose absence
  * cost round 15 its BENCH artifact (5 unconditional passes outgrew
  * the driver's wall cap; rc 124, `parsed: null`). Pure function, no
  * Spark session.
  *
  * Round 18 rule: projection is 0.95× the LAST completed pass against
  * a 680 s default budget. The r17 max-projection shipped two
  * consecutive single-pass artifacts: a deadline-truncated warm phase
  * leaves pass 1 carrying residual cold tax, so the max permanently
  * over-projects (the r17 judge run missed pass 2 by 0.86 s —
  * 310.43 × 2 = 620.86 vs 620). The last pass is the steady-state
  * estimate; 0.95 recovers exactly the truncated-warm case.
  */
class BenchGateSpec extends AnyFunSuite {

  test("repeat cap always wins: no pass past repeats even with infinite budget") {
    assert(!Bench.shouldContinue(5, 5, 10.0, 1.0, Double.MaxValue))
    assert(Bench.shouldContinue(4, 5, 10.0, 1.0, Double.MaxValue))
  }

  test("the r17 judge case: one 310.43 s pass vs the old 620 s budget now continues") {
    // old gate: 310.43 + 310.43 = 620.86 > 620 → stopped (the shipped
    // single-pass artifact); new projection: 310.43 + 0.95×310.43 =
    // 605.3 ≤ 620 → pass 2 runs even at the OLD budget
    assert(Bench.shouldContinue(1, 5, 310.43, 310.43, 620.0))
    // and trivially at the new 680 s default
    assert(Bench.shouldContinue(1, 5, 310.43, 310.43, 680.0))
  }

  test("warmed ~220 s passes vs the 680 s budget → 3 passes") {
    assert(Bench.shouldContinue(1, 5, 220.0, 220.0, 680.0)) // 429 ≤ 680 → pass 2
    assert(Bench.shouldContinue(2, 5, 440.0, 220.0, 680.0)) // 649 ≤ 680 → pass 3
    assert(!Bench.shouldContinue(3, 5, 660.0, 220.0, 680.0)) // 869 > 680 → stop
  }

  test("a fast suite still runs all repeats") {
    // 50 s/pass: 5 passes fit easily
    (1 to 4).foreach { p =>
      assert(Bench.shouldContinue(p, 5, 50.0 * p, 50.0, 680.0), s"pass $p")
    }
  }

  test("hot box (the r17 driver conditions, ~404 s passes): still stops after pass 1") {
    // 403.7 + 0.95×403.7 = 787.2 > 680: two ~400 s passes cannot fit
    // under the ~863 s driver cap, so single-pass is the CORRECT
    // outcome there — the gate must not chase a second pass it can't
    // afford
    assert(!Bench.shouldContinue(1, 5, 403.7, 403.7, 680.0))
  }

  test("projection tracks the LAST pass, not the max: a slow pass 1 no longer starves later passes") {
    // pass 1 disturbed at 400 s, pass 2 settled at 220 s: the old
    // max-gate projected 400 and stopped at elapsed 620 · 0.95×220=209
    // projects 829 > 680 → stop, but at elapsed 620 with last=220 the
    // new gate lets pass 3 run iff 620 + 209 ≤ 680 — it doesn't; at
    // elapsed 460 (a 240 s pass 1 + 220 s pass 2) it does
    assert(Bench.shouldContinue(2, 5, 460.0, 220.0, 680.0)) // 669 ≤ 680
    assert(!Bench.shouldContinue(2, 5, 620.0, 220.0, 680.0)) // 829 > 680
  }

  test("boundary: projection exactly at budget still runs (≤, not <)") {
    // 400 + 0.95×400 = 780 exactly
    assert(Bench.shouldContinue(1, 5, 400.0, 400.0, 780.0))
    assert(!Bench.shouldContinue(1, 5, 400.0, 400.02, 780.0))
  }
}
