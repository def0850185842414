package graft.util

import graft.SparkSpec

/** Cache-lifecycle contract for ops whose persisted intermediates
  * outlive the call ([[graft.ops.Mixture.curriculumOrder]],
  * [[graft.ops.DedupDocs.sourceOverlapMatrix]]'s huge-pair fallback):
  * they register with [[CacheRegistry]], `releaseAll()` drops storage,
  * and the returned plans stay correct afterwards (lineage recompute).
  */
class CacheRegistrySpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("curriculumOrder registers its slim cache; releaseAll drops it and the plan still answers") {
    CacheRegistry.releaseAll()
    assert(CacheRegistry.trackedCount == 0)
    val warm = Seq(1L, 2L, 3L).toDF("doc_id")
    val anneal = Seq(4L, 5L).toDF("doc_id")
    val ranked = graft.ops.Mixture.curriculumOrder(
      Seq("warm" -> warm, "anneal" -> anneal), salt = "s1")
    val before = ranked.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(CacheRegistry.trackedCount == 1)
    CacheRegistry.releaseAll()
    assert(CacheRegistry.trackedCount == 0)
    // storage gone, answer identical (pure-function hash/bucket columns)
    val after = ranked.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before)
    assert(before.map(_._3) == (0L until 5L).toSet)
  }

  test("sourceOverlapMatrix common (small-pair) path leaves nothing persisted") {
    CacheRegistry.releaseAll()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "srcA"),
      (2L, "alpha beta gamma delta epsilon zeta", "srcB"),
      (3L, "totally different words over here now", "srcA")
    ).toDF("doc_id", "text", "source")
    val m = graft.ops.DedupDocs.sourceOverlapMatrix(docs, k = 2, numHashes = 8, rowsPerBand = 2)
    val rows = m.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("srcA", "srcB", 1L)))
    assert(CacheRegistry.trackedCount == 0)
  }
}
