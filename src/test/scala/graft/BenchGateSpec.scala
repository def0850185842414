package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench pass-budget gate — the logic whose absence
  * cost round 15 its BENCH artifact (5 unconditional passes outgrew
  * the driver's wall cap; rc 124, `parsed: null`). Pure function, no
  * Spark session. */
class BenchGateSpec extends AnyFunSuite {

  test("repeat cap always wins: no pass past repeats even with infinite budget") {
    assert(!Bench.shouldContinue(5, 5, 10.0, 1.0, Double.MaxValue))
    assert(Bench.shouldContinue(4, 5, 10.0, 1.0, Double.MaxValue))
  }

  test("the r15 shape stops: 230-query passes at ~220 s vs a 720 s budget → 3 passes max") {
    // cold pass 1 = 313 s, warm = 220 s (the certified in-session numbers)
    assert(Bench.shouldContinue(1, 5, 313.0, 313.0, 720.0)) // 626 ≤ 720 → pass 2
    assert(!Bench.shouldContinue(2, 5, 533.0, 220.0, 720.0)) // 753 > 720 → stop
  }

  test("a fast suite still runs all repeats") {
    // 50 s/pass: 5 passes fit easily
    (1 to 4).foreach { p =>
      assert(Bench.shouldContinue(p, 5, 50.0 * p, 50.0, 720.0), s"pass $p")
    }
  }

  test("projection uses the MIN pass, not the average: a cold pass 1 can't strand budget") {
    // avg-based gate would project 313 + 313 = 626 fine, but after a
    // 313 + 400 (disturbed pass 2) = 713 elapsed, avg 356 projects 1069
    // while the min (the honest floor 220 from a later pass) lets the
    // loop keep trying as long as the budget truly allows
    assert(Bench.shouldContinue(2, 5, 400.0, 200.0, 720.0)) // 600 ≤ 720
    assert(!Bench.shouldContinue(2, 5, 600.0, 200.0, 720.0)) // 800 > 720
  }

  test("boundary: projection exactly at budget still runs (≤, not <)") {
    assert(Bench.shouldContinue(1, 5, 360.0, 360.0, 720.0))
    assert(!Bench.shouldContinue(1, 5, 360.0, 360.01, 720.0))
  }
}
