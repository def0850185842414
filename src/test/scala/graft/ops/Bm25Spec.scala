package graft.ops

import graft.SparkSpec

/** BM25 top-k: hand-computed fixture (Lucene +1 idf variant), absent
  * terms, doc_id tie-break, and the k limit. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b a c"),
    (1L, "b b c"),
    (2L, "x y")
  ).toDF("doc_id", "text")

  test("topK: hand-computed scores, non-matching docs dropped") {
    // N=3, avgdl=3; df: a→1, c→2
    // idf_a = ln(2.5/1.5 + 1) = ln(8/3); idf_c = ln(1.5/2.5 + 1) = ln(1.6)
    // d0 (dl=4, norm=1.25): w_a = idf_a·2·2.2/(2+1.5) = 1.2330424895...
    //                       w_c = idf_c·1·2.2/(1+1.5) = 0.4136031937...
    // d1 (dl=3, norm=1.0):  w_c = idf_c·2.2/2.2      = 0.4700036292...
    val out = Bm25.topK(docs, Seq("a", "c"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(out(0).getLong(1) == 2L && out(1).getLong(1) == 1L)
    assert(math.abs(out(0).getDouble(2) - 1.6466) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - 0.47) < 1e-9)
  }

  test("topK: terms absent from the corpus contribute nothing") {
    val withAbsent = Bm25.topK(docs, Seq("a", "c", "zzz"), k = 10).collect()
    val without = Bm25.topK(docs, Seq("a", "c"), k = 10).collect()
    assert(withAbsent.toSeq == without.toSeq)
    assert(Bm25.topK(docs, Seq("zzz"), k = 10).isEmpty)
  }

  test("topK: equal scores tie-break by doc_id; k truncates") {
    val same = Seq((5L, "a b"), (3L, "a b"), (4L, "a b")).toDF("doc_id", "text")
    val out = Bm25.topK(same, Seq("a"), k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(out.map(_.getDouble(2)).distinct.length == 1)
  }

  private def withIndex(df: org.apache.spark.sql.DataFrame)(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bm25-idx-").toString
    try { Bm25.buildIndex(df, dir, nBuckets = 8); f(dir) }
    finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("topKIndexed: identical results to the scan-form topK") {
    withIndex(docs) { dir =>
      for (q <- Seq(Seq("a", "c"), Seq("a", "c", "zzz"), Seq("b"))) {
        val scan = Bm25.topK(docs, q, k = 10).collect().toSeq
        val idx = Bm25.topKIndexed(spark, dir, q, k = 10).collect().toSeq
        assert(idx == scan, s"serve/scan divergence for terms $q")
      }
    }
  }

  test("topKIndexed: all-absent query terms yield an empty, stable-schema result") {
    withIndex(docs) { dir =>
      val out = Bm25.topKIndexed(spark, dir, Seq("zzz", "qqq"), k = 5)
      assert(out.isEmpty)
      assert(out.columns.toSeq == Seq("doc_id", "n_terms", "score"))
    }
  }

  test("termBucket matches Spark's pmod(hash(tok), n) bucketing exactly") {
    // build-side bucketing and probe-side pruning must agree or serving
    // silently reads the wrong partitions (empty results, no error)
    import org.apache.spark.sql.functions.{col, hash, pmod, lit}
    val terms = Seq("scan", "join", "vector", "stream", "merge", "zzz", "", "a", "ünïcode")
    val sparkSide = terms.toDF("tok")
      .select(col("tok"), pmod(hash(col("tok")), lit(8)).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(Bm25.termBucket(t, 8) == sparkSide(t), s"bucket mismatch for '$t'")
    }
  }
}
