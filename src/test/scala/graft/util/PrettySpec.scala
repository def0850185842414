package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** [[Pretty.durationRef]] against goldens produced by RUNNING the
  * reference's `PrettyDuration.time_string` logic
  * (jagular/utils.py:583-647, transcribed verbatim to Python and
  * executed — tools-side, see the fixture comment) over negative, zero,
  * fractional, day-scale, and infinite inputs. Includes the reference's
  * own quirks (ms-carry "591.0 seconds", "-inf" → "inf", "1 days "
  * always plural) — parity means identical strings, not prettier ones. */
class PrettySpec extends AnyFunSuite {

  private val goldens: Seq[(Double, String)] = Seq(
    0.0 -> "0.0 milliseconds",
    0.0005 -> "0.5 milliseconds",
    0.05 -> "50.0 milliseconds",
    0.1235 -> "123.5 milliseconds",
    0.5 -> "500.0 milliseconds",
    1.0 -> "1 seconds",
    1.5 -> "1.5 seconds",
    3.5 -> "3.5 seconds",
    59.0 -> "59 seconds",
    59.9 -> "59.9 seconds",
    59.99996 -> "591.0 seconds", // reference ms-carry artifact, replicated
    60.0 -> "1:00 minutes",
    61.0 -> "1:01 minutes",
    65.5 -> "1:05:500 minutes",
    120.25 -> "2:00:250 minutes",
    3599.0 -> "59:59 minutes",
    3600.0 -> "1:00:00 hours",
    3600.5 -> "1:00:00.5 hours", // hh>0 but mm==0: decimal ms form
    3725.5 -> "1:02:05:500 hours",
    7325.001 -> "2:02:05:001 hours",
    86400.0 -> "1 days 0.0 milliseconds",
    86401.0 -> "1 days 1 seconds",
    90061.5 -> "1 days 1:01:01:500 hours",
    172800.123 -> "2 days 123.0 milliseconds",
    259200.0 -> "3 days 0.0 milliseconds",
    -0.5 -> "-500.0 milliseconds",
    -1.0 -> "-1 seconds",
    -3.5 -> "-3.5 seconds",
    -61.0 -> "-1:01 minutes",
    -3725.5 -> "-1:02:05:500 hours",
    -86401.0 -> "-1 days 1 seconds",
    Double.PositiveInfinity -> "inf",
    Double.NegativeInfinity -> "inf" // isinf precedes sign in the reference
  )

  test("durationRef matches the reference's time_string on all goldens") {
    goldens.foreach { case (in, want) =>
      assert(Pretty.durationRef(in) == want, s"input $in")
    }
  }

  test("NaN raises, like the reference's floor(nan)") {
    intercept[IllegalArgumentException](Pretty.durationRef(Double.NaN))
  }

  test("negative zero renders positive, like Python -0.0 >= 0") {
    assert(Pretty.durationRef(-0.0) == "0.0 milliseconds")
  }
}
