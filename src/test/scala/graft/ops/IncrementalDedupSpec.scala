package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IncrementalDedup]]: directed admission decisions, and the defining
  * property — screen flags against a persisted index agree exactly with
  * the batch [[DedupDocs.minhashLshPairs]] run over corpus ∪ batch
  * (dup_of_corpus ⇔ pairs with a corpus doc; dup_within_new ⇔ pairs
  * with a smaller-id batch doc). */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val NH = 16
  private val RPB = 4

  test("directed: exact corpus dup, within-batch dup, fresh, and short docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different corpus document about engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // == corpus 1
      (11L, "a genuinely novel document with fresh content here"),
      (12L, "repeated batch document body text goes here now"),
      (13L, "repeated batch document body text goes here now"), // == 12
      (14L, "xx yy") // < k tokens: no shingles
    ).toDF("doc_id", "text")
    val idx = IncrementalDedup.buildIndex(corpus, K, NH, RPB)
    val got = IncrementalDedup
      .screen(batch, idx, K, NH, RPB)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(got(10L) == ((1, 0)))
    assert(got(11L) == ((0, 0)))
    assert(got(12L) == ((0, 0))) // bucket min keeps the smaller id
    assert(got(13L) == ((0, 1)))
    assert(got(14L) == ((0, 0)))
    val admitted = IncrementalDedup
      .admit(batch, idx, K, NH, RPB)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(admitted.toSeq == Seq(11L, 12L, 14L))
  }

  test("property: screen == batch LSH pairs over the union, random corpora") {
    val rnd = new scala.util.Random(90121)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def text() = (0 until (K + rnd.nextInt(6))).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // small vocab + short docs => plenty of genuine signature collisions
    val corpusRows = (0L until 30L).map(i => (i, text()))
    val randomBatch = (100L until 125L).map(i => (i, text()))
    // guarantee at least one collision of each kind (exact text reuse →
    // identical signatures → all bands collide); the random rest
    // exercises partial/no-collision shapes
    val batchRows = randomBatch ++ Seq(
      (200L, corpusRows(3)._2),      // vs corpus
      (201L, randomBatch(5)._2)      // vs smaller batch id 105
    )
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")

    val pairs = DedupDocs
      .minhashLshPairs(corpus.union(batch), K, NH, RPB)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))) // doc_a < doc_b
    val corpusIds = corpusRows.map(_._1).toSet
    val expDupCorpus = pairs.collect {
      case (a, b) if corpusIds.contains(a) && !corpusIds.contains(b) => b
    }.toSet
    val expDupNew = pairs.collect {
      case (a, b) if !corpusIds.contains(a) && !corpusIds.contains(b) => b // a < b, both batch
    }.toSet

    val got = IncrementalDedup
      .screen(batch, IncrementalDedup.buildIndex(corpus, K, NH, RPB), K, NH, RPB)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(got.size == batchRows.size)
    batchRows.map(_._1).foreach { id =>
      assert(got(id)._1 == (if (expDupCorpus.contains(id)) 1 else 0), s"dup_of_corpus doc $id")
      assert(got(id)._2 == (if (expDupNew.contains(id)) 1 else 0), s"dup_within_new doc $id")
    }
    // sanity: the generator actually produced collisions of both kinds
    assert(expDupCorpus.nonEmpty && expDupNew.nonEmpty)
  }
}
