package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (zip, age_band, disease)
    ("02139", "30-40", "flu"),
    ("02139", "30-40", "flu"),
    ("02139", "30-40", "cold"),
    ("02139", "40-50", "flu"),
    ("94110", "30-40", null),
    ("94110", "30-40", "cold")
  ).toDF("zip", "age_band", "disease")

  test("kAnonymity: class sizes and violations at k = 3") {
    val got = Privacy.kAnonymity(rows, Seq("zip", "age_band"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got == Map(
      ("02139", "30-40") -> ((3L, 0)),
      ("02139", "40-50") -> ((1L, 1)),
      ("94110", "30-40") -> ((2L, 1))))
  }

  test("lDiversity: distinct sensitive values per class, NULL discloses nothing") {
    val got = Privacy.lDiversity(rows, Seq("zip", "age_band"), "disease", l = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got == Map(
      ("02139", "30-40") -> ((3L, 2L, 0)), // flu+cold: diverse
      ("02139", "40-50") -> ((1L, 1L, 1)), // homogeneity attack
      ("94110", "30-40") -> ((2L, 1L, 1)))) // null excluded -> 1 distinct
  }

  test("a k-anonymous class can still violate l-diversity (the homogeneity case)") {
    val homo = Seq.fill(5)(("10001", "20-30", "flu")).toDF("zip", "age_band", "disease")
    val ka = Privacy.kAnonymity(homo, Seq("zip", "age_band"), k = 3).head()
    val ld = Privacy.lDiversity(homo, Seq("zip", "age_band"), "disease", l = 2).head()
    assert(ka.getAs[Int]("k_violation") == 0)
    assert(ld.getAs[Int]("l_violation") == 1)
  }

  test("tCloseness: hand-computed ordered EMD and cross-multiplied flag") {
    val df = Seq(
      ("A", 0L), ("A", 0L), ("A", 1L), ("A", 1L),
      ("B", 0L), ("B", 0L)
    ).toDF("grp", "v")
    // global: v0=4 v1=2, N=6, m=2; A: D=4, emd=4/24; B: D=4, emd=4/12
    val got = Privacy.tCloseness(df, Seq("grp"), "v", tMicro = 250000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(got("A") == ((4L, 0.166667, 0)))
    assert(got("B") == ((2L, 0.333333, 1)))
  }

  test("tCloseness: single global value -> emd 0, no violations") {
    val df = Seq(("A", 7L), ("A", 7L), ("B", 7L)).toDF("grp", "v")
    val rows = Privacy.tCloseness(df, Seq("grp"), "v", tMicro = 0L).collect()
    assert(rows.forall(r => r.getDouble(2) == 0.0 && r.getInt(3) == 0))
  }

  test("tCloseness: NULL sensitive fails loud; value-cap guard trips") {
    val bad = Seq(("A", Option.empty[java.lang.Long]), ("A", Option(1L).map(Long.box)))
      .toDF("grp", "v")
    val ex = intercept[Exception](
      Privacy.tCloseness(bad, Seq("grp"), "v", tMicro = 0L).collect())
    assert(ex.getMessage.contains("Privacy"))
    val wide = (1L to 50L).map(i => ("A", i)).toDF("grp", "v")
    val cap = intercept[IllegalArgumentException](
      Privacy.tCloseness(wide, Seq("grp"), "v", tMicro = 0L, maxValues = 10))
    assert(cap.getMessage.contains("band the attribute"))
  }
}
