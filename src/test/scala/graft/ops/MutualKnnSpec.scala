package graft.ops

import graft.SparkSpec

class MutualKnnSpec extends SparkSpec {
  import spark.implicits._

  // 2-D geometry with a known mutual structure
  private val nodes = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("k=1 keeps only the single fully-mutual pair") {
    val got = Similarity.mutualKnn(nodes, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }

  test("k=2 mutual edges and rank bookkeeping") {
    val got = Similarity.mutualKnn(nodes, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(3), r.getInt(4)))
      .toMap
    // (0,1) mutual at rank 1/1; (1,2): 2 is v1's #2, 1 is v2's #1;
    // (2,3): 3 is v2's #2, 2 is v3's #1; (0,2) is NOT mutual (v2's
    // top-2 is {1, 3})
    assert(got.keySet == Set((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(got((0L, 1L)) == (1, 1))
    assert(got((1L, 2L)) == (2, 1))
    assert(got((2L, 3L)) == (2, 1))
  }

  test("edges are canonical (a < b) and cos_sim is symmetric-rounded") {
    val rows = Similarity.mutualKnn(nodes, k = 2).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val c01 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getDouble(2)
    // cos((1,0),(0.9,0.1)) = 0.9/0.90554 ~ 0.993884
    assert(math.abs(c01 - 0.993884) < 1e-6, c01.toString)
  }
}
