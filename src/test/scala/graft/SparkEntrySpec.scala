package graft

/** Guards on the driver contract itself. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke scale (driver t1 check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; aliases are stable") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys without queries: ${ok -- qk}")
    // rows-only queries are the documented kernel exceptions only:
    // k-means-trained codebooks/centroids are not SQL-expressible, so
    // the PQ serving queries get the driver's weaker rows-only check
    // (semantics pinned by PqSpec instead)
    val rowsOnly = Set("q_pq_topk", "q_ivfpq_topk", "q_ivfpq_serve")
    assert((qk -- ok) == rowsOnly, s"unexpected rows-only: ${qk -- ok -- rowsOnly}")
  }

  test("every query runs and yields a non-empty schema at smoke scale") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
