package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AsOf.asofBackward]] semantics: inclusive bound, LEFT nulls,
  * per-key isolation, row-consistent multi-column payloads. */
class AsOfSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("backward as-of: latest right at or before left time, inclusive bound, LEFT nulls") {
    val left = Seq((1L, 10L), (1L, 15L), (1L, 4L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 15L, "b"), (3L, 1L, "z")).toDF("k", "t", "v")
    val got = AsOf.asofBackward(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("a")),
      (1L, 15L, Some("b")), // right at exactly t=15 matches (inclusive)
      (1L, 4L, None),       // nothing at or before 4
      (2L, 10L, None)       // key 2 never sees key 1/3 rows
    ))
  }

  test("multi-column payload is carried from ONE right row even when a column is null") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq(
      (1L, 5L, Some("early"), Some(100L)),
      (1L, 10L, Some("late"), None: Option[Long]) // latest row: y is null
    ).toDF("k", "t", "x", "y")
    val r = AsOf.asofBackward(left, right, Seq("k"), "t", Seq("x", "y")).head()
    // both columns come from the t=10 row: x="late", y=null — NOT a mix
    assert(r.getString(2) == "late" && r.isNullAt(3))
  }

  test("reserved internal column names on either input fail fast") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left.withColumn("__side", lit(1)), right, Seq("k"), "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right.withColumn("__p", lit(1)), Seq("k"), "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right.withColumn("__v_x", lit(1)), Seq("k"), "t", Seq("v"))
    }
    // __pp is the BUCKETED form's internal payload column — both entry
    // points share the guard, so it must reject there too
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardBucketed(
        left.withColumn("__pp", lit(1)), right, Seq("k"), "t", Seq("v"), bucketWidth = 10)
    }
  }

  test("bucketed form is exact at nanosecond-scale times (integral epoch division)") {
    // |t| > 2^53: double division would misplace epoch boundaries; the
    // integral-divide epoch must keep parity with the window form
    val t0 = 1700000000000000000L // ~2023 in ns
    val left = (0L until 20L).map(i => (1L, t0 + i * 7L)).toDF("k", "t")
    val right = (0L until 6L).map(i => (1L, t0 + i * 23L, s"v$i")).toDF("k", "t", "v")
    val expected = AsOf.asofBackward(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSeq.sorted
    Seq(3L, 16L).foreach { w =>
      val got = AsOf.asofBackwardBucketed(left, right, Seq("k"), "t", Seq("v"), bucketWidth = w)
        .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSeq.sorted
      assert(got == expected, s"bucketWidth=$w")
    }
  }

  test("bucketed (skew-hatch) form is row-identical to the window form across bucket widths") {
    // hot key 1 (many rows), quiet key 2, key 3 right-only; negative
    // times, epoch-spanning gaps, exact-time tie (inclusive bound),
    // left rows in epochs with no right rows (pure carry-in)
    val left = ((0L until 40L).map(i => (1L, i * 3 - 20)) ++
      Seq((1L, 15L), (2L, 10L), (2L, -5L))).toDF("k", "t")
    val right = (Seq((1L, -7L, "n"), (1L, 15L, "b"), (1L, 60L, "c"), (3L, 1L, "z")) ++
      (0L until 5L).map(i => (2L, i * 20, s"r$i"))).toDF("k", "t", "v")
    val expected = AsOf.asofBackward(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq.sorted
    Seq(1L, 7L, 1000L).foreach { w =>
      val got = AsOf.asofBackwardBucketed(left, right, Seq("k"), "t", Seq("v"), bucketWidth = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq.sorted
      assert(got == expected, s"bucketWidth=$w")
    }
  }

  test("bucketed form carries an all-null-fielded payload like the plain form") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 5L, Option.empty[String], Option.empty[Long]))
      .toDF("k", "t", "x", "y")
    // carry-in crosses many epochs; the payload struct is non-null with
    // null fields — must surface as a MATCHED row with null columns,
    // not be dropped as "no earlier right row"
    val plain = AsOf.asofBackward(left, right, Seq("k"), "t", Seq("x", "y")).head()
    val bucketed = AsOf
      .asofBackwardBucketed(left, right, Seq("k"), "t", Seq("x", "y"), bucketWidth = 3)
      .head()
    assert(plain.isNullAt(2) && plain.isNullAt(3))
    assert(bucketed.isNullAt(2) && bucketed.isNullAt(3))
  }

  test("composite key as-of") {
    val left = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("k1", "k2", "t")
    val right = Seq((1L, "a", 5L, 1.5), (1L, "b", 6L, 2.5)).toDF("k1", "k2", "t", "v")
    val got = AsOf.asofBackward(left, right, Seq("k1", "k2"), "t", Seq("v"))
      .collect().map(r => (r.getString(1), r.getDouble(3))).toSet
    assert(got == Set(("a", 1.5), ("b", 2.5)))
  }
}
