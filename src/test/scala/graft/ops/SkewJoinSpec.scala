package graft.ops

import graft.SparkSpec

/** [[SkewJoin.skewAdvisor]] — hot keys on either side surface with
  * exact multiplicities, the fan-out product stays exact in decimal,
  * and the salt ceiling is a true integral ceil (no 6dp-divide
  * rounding across an integer boundary). */
class SkewJoinSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("skewAdvisor: per-key counts, fan-out, ceil salt; one-sided hot keys included") {
    val a = (Seq.fill(10)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold") ++ Seq.fill(5)("aOnly"))
      .toDF("k")
    val b = (Seq.fill(4)("hot") ++ Seq.fill(7)("bOnly") ++ Seq("warm")).toDF("k")
    val got = SkewJoin.skewAdvisor(a, "k", b, "k", hotThreshold = 5, targetPairsPerTask = 10)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(), r.getLong(4))))
      .toMap
    // hot: 10×4 = 40 pairs → ceil(40/10) = 4 salts
    assert(got("hot") == ((10L, 4L, 40L, 4L)))
    // aOnly: hot on A, absent on B → 0 pairs, salt floor 1
    assert(got("aOnly") == ((5L, 0L, 0L, 1L)))
    // bOnly: hot on B only
    assert(got("bOnly") == ((0L, 7L, 0L, 1L)))
    // warm (3, 1) and cold (1, 0) are below threshold on both sides
    assert(!got.contains("warm") && !got.contains("cold"))
  }

  test("skewAdvisor: exact ceil at a boundary (est divisible by target gives no +1)") {
    val a = Seq.fill(6)("k").toDF("k")
    val b = Seq.fill(5)("k").toDF("k")
    // 30 pairs, target 10 → exactly 3; a rounded decimal divide of
    // 39/10 = 3.9 would also pass, but 30/10 must NOT become 4
    val r = SkewJoin.skewAdvisor(a, "k", b, "k", 2, 10).head()
    assert(r.getLong(4) == 3L)
  }
}
