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

  test("forward as-of: earliest right at or after, inclusive bound, tolerance") {
    val left = Seq((1L, 10L), (1L, 15L), (1L, 40L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 15L, "b"), (1L, 30L, "c"), (3L, 1L, "z")).toDF("k", "t", "v")
    val got = AsOf.asofForward(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("b")),
      (1L, 15L, Some("b")), // exact time matches (inclusive)
      (1L, 40L, None),      // nothing at or after 40
      (2L, 10L, None)
    ))
    // tolerance 5: the t=10 click is 5 ahead of b (kept); t=16 → c is 14 ahead (nulled)
    val tl = Seq((1L, 10L), (1L, 16L)).toDF("k", "t")
    val tol = AsOf.asofForward(tl, right, Seq("k"), "t", Seq("v"), tolerance = Some(5L))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSet
    assert(tol == Set((10L, Some("b")), (16L, None)))
  }

  test("nearest as-of: closer side wins, exact tie resolves backward, tolerance both sides") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 26L), (1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 12L, "r12"), (1L, 28L, "r28"), (1L, 20L, "r20")).toDF("k", "t", "v")
    val got = AsOf.asofNearest(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(1), r.getString(2))).toMap
    assert(got == Map(
      10L -> "r12",  // only-forward region
      20L -> "r20",  // exact time: distance 0, backward
      26L -> "r28",  // forward (2) beats backward (6)
      100L -> "r28"  // only-backward region
    ))
    // equidistant: backward wins deterministically
    val tie = AsOf.asofNearest(Seq((1L, 20L)).toDF("k", "t"),
        Seq((1L, 12L, "lo"), (1L, 28L, "hi")).toDF("k", "t", "v"), Seq("k"), "t", Seq("v"))
      .head().getString(2)
    assert(tie == "lo")
    // tolerance 3: t=10 keeps r12 (dist 2), t=26 keeps r28 (dist 2),
    // t=100 nulls (nearest right is 72 away)
    val tol = AsOf.asofNearest(left, right, Seq("k"), "t", Seq("v"), tolerance = Some(3L))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toMap
    assert(tol == Map(
      10L -> Some("r12"), 20L -> Some("r20"), 26L -> Some("r28"), 100L -> None))
  }

  test("all three directions match a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(42)
    val leftRows = (0 until 300).map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong))
    val rightRows = (0 until 120)
      .map(_ => (rnd.nextInt(6).toLong, rnd.nextInt(200).toLong))
      .distinct // unique per (key, time) by contract
      .zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i") }
    val left = leftRows.toDF("k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val byKey = rightRows.groupBy(_._1)
    def bw(k: Long, t: Long) = byKey.getOrElse(k, Nil).filter(_._2 <= t)
      .sortBy(r => (r._2, r._3)).lastOption
    def fw(k: Long, t: Long) = byKey.getOrElse(k, Nil).filter(_._2 >= t)
      .sortBy(r => (r._2, r._3)).headOption
    def check(df: org.apache.spark.sql.DataFrame, expect: (Long, Long) => Option[String]): Unit = {
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
        .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
      leftRows.distinct.foreach { case (k, t) =>
        assert(got((k, t)) == Set(expect(k, t)), s"key=$k t=$t")
      }
    }
    check(AsOf.asofBackward(left, right, Seq("k"), "t", Seq("v")), (k, t) => bw(k, t).map(_._3))
    check(AsOf.asofForward(left, right, Seq("k"), "t", Seq("v")), (k, t) => fw(k, t).map(_._3))
    val tol = 15L
    check(
      AsOf.asofNearest(left, right, Seq("k"), "t", Seq("v"), tolerance = Some(tol)),
      (k, t) => {
        val b = bw(k, t).filter(r => t - r._2 <= tol)
        val f = fw(k, t).filter(r => r._2 - t <= tol)
        (b, f) match {
          case (Some(br), Some(fr)) => if (t - br._2 <= fr._2 - t) Some(br._3) else Some(fr._3)
          case (Some(br), None) => Some(br._3)
          case (None, Some(fr)) => Some(fr._3)
          case _ => None
        }
      })
  }

  test("composite key as-of") {
    val left = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("k1", "k2", "t")
    val right = Seq((1L, "a", 5L, 1.5), (1L, "b", 6L, 2.5)).toDF("k1", "k2", "t", "v")
    val got = AsOf.asofBackward(left, right, Seq("k1", "k2"), "t", Seq("v"))
      .collect().map(r => (r.getString(1), r.getDouble(3))).toSet
    assert(got == Set(("a", 1.5), ("b", 2.5)))
  }
}
