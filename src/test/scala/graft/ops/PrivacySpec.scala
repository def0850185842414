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
}
