package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** [[graft.ops.Dialogs]]: QA flags on hand-built conversations
  * (including the ANSI edge cases — empty and NULL turn arrays,
  * single-turn dialogs), template flattening, and the role rollup. */
class DialogsSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[(String, String)])]) =
    rows.toDF("id", "raw")
      .select(col("id"),
        transform(col("raw"),
          x => struct(x.getField("_1").as("role"), x.getField("_2").as("content")))
          .as("turns"))

  test("validateDialogs: every flag and the composite valid bit") {
    val d = df(Seq(
      (0L, Seq("user" -> "hi", "assistant" -> "yo")),            // valid
      (1L, Seq("assistant" -> "bad", "user" -> "x")),            // wrong start/end
      (2L, Seq("user" -> "a", "user" -> "b", "assistant" -> "c")), // no alternation
      (3L, Seq("user" -> "q", "assistant" -> "")),               // empty content
      (4L, Seq("user" -> "only")),                               // 1 turn, ends user
      (5L, Seq.empty)))                                          // empty array
    val got = Dialogs.validateDialogs(d, "turns")
      .orderBy("id")
      .select("n_turns", "n_user", "n_assistant", "starts_user", "ends_assistant",
        "alternates", "has_empty", "valid")
      .collect()
    assert(got(0) == Row(2L, 1L, 1L, true, true, true, false, true))
    assert(got(1) == Row(2L, 1L, 1L, false, false, true, false, false))
    assert(got(2) == Row(3L, 2L, 1L, true, true, false, false, false))
    assert(got(3) == Row(2L, 1L, 1L, true, true, true, true, false))
    assert(got(4) == Row(1L, 1L, 0L, true, false, true, false, false))
    assert(got(5) == Row(0L, 0L, 0L, false, false, false, false, false))
  }

  test("validateDialogs: NULL turns array → n_turns 0, invalid (no ANSI raise)") {
    val d = df(Seq((0L, Seq("user" -> "x"))))
      .select(col("id"), when(col("id") < 0, col("turns")).as("turns")) // always NULL
    val r = Dialogs.validateDialogs(d, "turns").select("n_turns", "valid").head()
    assert(r == Row(0L, false))
  }

  test("flattenDialog: exact template, flattenValid gates + measures") {
    val d = df(Seq(
      (0L, Seq("user" -> "q1", "assistant" -> "a1", "user" -> "q2", "assistant" -> "a2")),
      (1L, Seq("assistant" -> "invalid", "user" -> "x"))))
    val rows = Dialogs.flattenValid(d, "turns").select("id", "text", "n_chars").collect()
    assert(rows.length == 1)
    val expected = "<|user|>\nq1\n<|assistant|>\na1\n<|user|>\nq2\n<|assistant|>\na2\n<|end|>"
    assert(rows(0) == Row(0L, expected, expected.length.toLong))
  }

  test("validatePreferencePairs + preferenceBias: identical/empty gates, length-bias readout") {
    val d = Seq(
      ("p0", "longer answer ok", "short"), // valid, chosen longer, ratio 3.2
      ("p1", "same", "same"),              // identical
      ("p2", "", "x"),                     // empty chosen
      ("p3", "ab", "abcd"),                // valid, ratio 0.5
      ("p4", "y", null)                    // null rejected
    ).toDF("prompt", "chosen", "rejected")
    val v = Dialogs.validatePreferencePairs(d, "prompt", "chosen", "rejected")
      .select("prompt", "identical", "has_empty", "len_ratio", "valid").orderBy("prompt")
      .collect()
    assert(v(0) == Row("p0", false, false, 3.2, true))
    assert(v(1) == Row("p1", true, false, 1.0, false))
    assert(v(2) == Row("p2", false, true, 0.0, false))
    assert(v(3) == Row("p3", false, false, 0.5, true))
    assert(v(4) == Row("p4", false, true, null, false))
    val b = Dialogs.preferenceBias(d, "prompt", "chosen", "rejected").head()
    assert(b == Row(2L, 1L, 0.5, 1.85)) // (3.2 + 0.5) / 2
  }

  test("roleStats: per-role turn counts and char mass") {
    val d = df(Seq(
      (0L, Seq("user" -> "abc", "assistant" -> "defgh")),
      (1L, Seq("user" -> "x", "system" -> "sys", "assistant" -> ""))))
    val got = Dialogs.roleStats(d, "turns").orderBy("role").collect()
    assert(got(0) == Row("assistant", 2L, 5L, 2.5))
    assert(got(1) == Row("system", 1L, 3L, 3.0))
    assert(got(2) == Row("user", 2L, 4L, 2.0))
  }
}
