package graft.ops

import graft.SparkSpec

/** [[Profile]] — the one-pass profiling contract: exact
  * completeness/range/mean, KMV-exact distinct below k, and ONE
  * aggregation pass (single Exchange) no matter how many columns. */
class ProfileSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("exact stats, nulls counted, distinct exact below k") {
    val df = Seq[(java.lang.Long, Option[String])](
      (1L, Some("aa")), (2L, Some("bbb")), (2L, None), (null, Some("aa"))
    ).toDF("v", "t")
    val got = Profile.profile(df, numericCols = Seq("v"), stringCols = Seq("t"), k = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val v = got("v")
    assert(v.getLong(1) == 4L && v.getLong(2) == 1L)           // n_rows, n_null
    assert(v.getDouble(3) == 2.0)                              // distinct {1, 2}
    assert(v.getDouble(4) == 1.0 && v.getDouble(5) == 2.0)     // min, max
    assert(v.getDouble(6) == 1.666667)                         // mean over non-null, 6dp
    val t = got("t")
    assert(t.getLong(2) == 1L && t.getDouble(3) == 2.0)        // null; {aa, bbb}
    assert(t.getDouble(4) == 2.0 && t.getDouble(5) == 3.0)     // len range
    assert(t.getDouble(6) == 2.333333)                         // mean len, 6dp
  }

  test("all-null column yields 0 distinct and null min/max/mean") {
    val df = Seq[(Int, Option[String])]((1, None), (2, None)).toDF("v", "t")
    val r = Profile.profile(df, Seq("v"), Seq("t")).collect()
      .find(_.getString(0) == "t").get
    assert(r.getLong(2) == 2L && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("drift: null-rate and mean arms flag independently; stable columns stay quiet") {
    val before = Seq((1.0, 5.0, "x"), (2.0, 5.0, "y"), (3.0, 5.0, "x"))
      .toDF("moves", "stays", "s")
    val after = Seq[(java.lang.Double, java.lang.Double, String)](
      (10.0, 5.0, "x"), (20.0, 5.0, "y"), (null, 5.0, "x"))
      .toDF("moves", "stays", "s")
    val got = Profile
      .drift(before, after, Seq("moves", "stays"), Seq("s"),
        nullRateTol = 0.1, meanRelTol = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), Option(r.get(7)), r.getInt(8)))).toMap
    // moves: mean 2 → 15 (rel 6.5) AND a null appeared (rate 0 → 1/3)
    assert(got("moves") == ((0.0, 0.333333, Some(6.5), 1)))
    assert(got("stays") == ((0.0, 0.0, Some(0.0), 0)))
    assert(got("s")._4 == 0)
  }

  test("drift: a null mean never trips the mean arm — the null-rate arm carries it") {
    val before = Seq((1, Some(1.0)), (2, Some(2.0))).toDF("id", "v")
    val after = Seq[(Int, Option[Double])]((1, None), (2, None)).toDF("id", "v")
    val r = Profile.drift(before, after, Seq("v"), Nil).collect()
      .find(_.getString(0) == "v").get
    assert(r.isNullAt(7))          // mean_rel_delta null (mean_b is null)
    assert(r.getInt(8) == 1)       // but the null-rate arm flags
  }

  test("histQuantiles: within one bucket width of truth, stable across partitionings") {
    val vals = (1 to 100).map(_.toDouble)
    val width = (100.0 - 1.0) / 50
    for (parts <- Seq(1, 7)) {
      val df = vals.map(v => (v, v * 10)).toDF("a", "b").repartition(parts)
      val got = Profile.histQuantiles(df, Seq("a", "b"), Seq(0.5, 0.95), buckets = 50)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(math.abs(got(("a", 0.5)) - 50.0) <= width + 1e-9)
      assert(math.abs(got(("a", 0.95)) - 95.0) <= width + 1e-9)
      assert(math.abs(got(("b", 0.5)) - 500.0) <= 10 * width + 1e-9)
      assert(got.size == 4)
    }
  }

  test("histQuantiles: nulls ignored; constant column returns the constant") {
    val df = Seq[(Option[Double], Double)](
      (Some(1.0), 7.0), (None, 7.0), (Some(3.0), 7.0)).toDF("v", "c")
    val got = Profile.histQuantiles(df, Seq("v", "c"), Seq(1.0), buckets = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // v: n=2, p=1.0 targets the 2nd value (3.0); estimate is its
    // bucket's lower edge
    assert(got("v") >= 1.0 && got("v") <= 3.0)
    assert(got("c") == 7.0)
  }

  test("one aggregation pass: a 6-column profile has exactly one Exchange") {
    val df = (0 until 1000).map(i =>
      (i.toLong, i % 7, i % 13, s"s$i", s"t${i % 5}", s"u${i % 3}"))
      .toDF("a", "b", "c", "d", "e", "f")
    val plan = Profile
      .profile(df, Seq("a", "b", "c"), Seq("d", "e", "f"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("fkOrphans: orphan rows vs keys, NULL keys separate, duplicate parents don't multiply") {
    val child = Seq[java.lang.Long](1L, 1L, 2L, 3L, 3L, 3L, null)
      .toDF("fk")
    // parent has 1 twice (multiplicity must not double-count child 1)
    // and lacks 3 → 3 orphan rows of 1 orphan key
    val parent = Seq(1L, 1L, 2L).toDF("pk")
    val r = Profile.fkOrphans(child, "fk", parent, "pk").head()
    assert(r.getLong(0) == 7L) // n_child
    assert(r.getLong(1) == 1L) // n_null_keys
    assert(r.getLong(2) == 3L) // n_orphan_rows
    assert(r.getLong(3) == 1L) // n_orphan_keys
    assert(r.getDouble(4) == 0.5) // 3/6
  }

  test("embeddingAudit: nulls / wrong dims / non-finite / zero vectors split; exact norm profile") {
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),   // norm 5
      (2L, Some(Seq(0.0f, 0.0f))),   // zero vector, norm 0
      (3L, Some(Seq(1.0f, Float.NaN))),
      (4L, Some(Seq(1.0f))),          // wrong dim
      (5L, None),
      (6L, Some(Seq(Float.PositiveInfinity, 1.0f)))
    ).toDF("id", "vec")
    val r = Profile.embeddingAudit(df, "vec", dim = 2).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L) // n, n_null
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L) // wrong dim, nonfinite
    assert(r.getLong(4) == 1L) // zero vector
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 5.0)
    assert(r.getDouble(7) == 2.5) // mean of {0, 5}
  }

  test("embeddingAudit: NULL component classifies as non-finite — buckets sum to n") {
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(4.0f)))),  // clean, norm 5
      (2L, Some(Seq(Some(1.0f), None)))          // NULL component → n_nonfinite
    ).toDF("id", "vec")
    val r = Profile.embeddingAudit(df, "vec", dim = 2).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L) // n, n_null
    assert(r.getLong(3) == 1L, "NULL component must land in n_nonfinite, not no bucket")
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 5.0) // norm stats over the clean row only
  }

  test("embeddingAudit: no clean vectors → NULL norm stats, counts still exact") {
    val df = Seq((1L, None: Option[Seq[Float]])).toDF("id", "vec")
    val r = Profile.embeddingAudit(df, "vec", dim = 2).head()
    assert(r.getLong(1) == 1L && r.isNullAt(5) && r.isNullAt(7))
  }

  test("fkOrphans: clean FK scores zero; all-null child keys rate 0") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.fkOrphans(child, "fk", parent, "pk").head()
    assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
    val nulls = Seq[java.lang.Long](null, null).toDF("fk")
    val r2 = Profile.fkOrphans(nulls, "fk", parent, "pk").head()
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 2L && r2.getDouble(4) == 0.0)
  }
}
