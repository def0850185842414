package graft

/** Guards on the driver contract itself. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke scale (driver t1 check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; aliases are stable") {
    val qk = SparkEntry.queries.keySet
    val ok0 = SparkEntry.oracleSql.keySet
    assert(ok0.subsetOf(qk), s"oracle keys without queries: ${ok0 -- qk}")
    // Oracles GENERATED from trained artifacts (PQ codebooks, k-means
    // centroids, the distilled classifier weights) are recorded when the
    // queries run; only these keys may be absent BEFORE a run.
    val generated = Set(
      "q_pq_topk", "q_ivfpq_topk", "q_ivfpq_serve", "q_semdedup", "q_quality_classifier",
      "q_dsir", "q_dsir_bigram", "q_bpe_encode", "q_pca_project",
      "q_isotonic", "q_isotonic_score")
    // No rows-only queries remain: q_compress_ratio (the former sole
    // entry — DuckDB has no deflate) now checks against a golden
    // literal table of CPython-zlib deflate sizes per fixture residue.
    val rowsOnly = Set.empty[String]
    assert((qk -- ok0).subsetOf(generated ++ rowsOnly),
      s"unexpected oracle-less: ${qk -- ok0 -- generated -- rowsOnly}")
    // After a smoke-scale run (Verify's run-then-dump order) the map
    // covers EVERY query — no rows-only entries remain.
    val dir = "/root/testdata/sf0.001"
    Seq("q_pq_topk", "q_ivfpq_topk", "q_semdedup", "q_quality_classifier", "q_dsir",
      "q_dsir_bigram", "q_bpe_encode", "q_pca_project", "q_isotonic", "q_isotonic_score")
      .foreach(n => SparkEntry.queries(n)(spark, dir).count())
    val ok = SparkEntry.oracleSql.keySet
    assert(ok == qk -- rowsOnly, s"queries without an oracle after running: ${qk -- ok -- rowsOnly}")
  }

  test("every query runs and yields a non-empty schema at smoke scale") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
