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

  private def randomDocs(seed: Int, ids: Seq[Long], maxExtra: Int = 6) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    ids.map(i =>
      (i, (0 until (K + rnd.nextInt(maxExtra))).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
  }

  test("screenVerified at minJaccard <= rowsPerBand/numHashes degenerates to screen") {
    // a band collision IS rowsPerBand matching components, so the
    // threshold is vacuous and the two contracts must agree exactly
    val corpus = randomDocs(4501, 0L until 40L).toDF("doc_id", "text")
    val batch = randomDocs(4502, 100L until 140L).toDF("doc_id", "text")
    val plain = IncrementalDedup
      .screen(batch, IncrementalDedup.buildIndex(corpus, K, NH, RPB), K, NH, RPB)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val verified = IncrementalDedup
      .screenVerified(
        batch, IncrementalDedup.buildIndexWithSignatures(corpus, K, NH, RPB),
        K, NH, RPB, minJaccard = RPB.toDouble / NH)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(verified == plain)
  }

  // 20-token docs from a 12-word vocab, and perturbations that keep a
  // prefix and rewrite the rest: keep=12 of 20 tokens ≈ Jaccard 0.38
  // (collides in some band ~10% of the time, nearly always below the
  // 8/16 verification threshold), keep=18 ≈ Jaccard 0.8 (collides and
  // verifies). Seeds picked so the fixed corpus exhibits hits AND
  // sub-threshold rejections on both the corpus and within-new sides.
  private val bigVocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "lam", "mu")
  private def longDocs(seed: Int, ids: Seq[Long], len: Int) = {
    val rnd = new scala.util.Random(seed)
    ids.map(i => (i, (0 until len).map(_ => bigVocab(rnd.nextInt(bigVocab.length))).mkString(" ")))
  }
  private def perturbed(cRows: Seq[(Long, String)], seed: Int, keep: Int, base: Long) = {
    val rnd = new scala.util.Random(seed)
    cRows.zipWithIndex.map { case ((_, text), i) =>
      val toks = text.split(" ").toSeq
      val extra = (0 until (toks.length - keep)).map(_ => bigVocab(rnd.nextInt(bigVocab.length)))
      (base + i, (toks.take(keep) ++ extra).mkString(" "))
    }
  }

  test("property: screenVerified == collision candidates filtered by signature match count") {
    // ground truth computed directly from the collected signatures —
    // independent of the screen's join shapes
    val corpusRows = longDocs(4014, 0L until 30L, 20)
    val batchRows =
      perturbed(corpusRows.take(12), 4015, keep = 12, base = 100L) ++     // J≈0.38 vs corpus
      perturbed(corpusRows.slice(12, 18), 4022, keep = 18, base = 162L) ++ // J≈0.8 vs corpus
      longDocs(4028, 180L until 190L, 20) ++                              // fresh
      Seq(
        (200L, corpusRows(7)._2), // exact corpus dup: 16/16 matches
        (201L, "xx yy")           // < k tokens: no signature, never flagged
      )
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val minJ = 0.5
    val minMatches = math.ceil(minJ * NH).toInt

    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      DedupDocs.bandKeysWithSig(df, K, NH, RPB)
        .select(col("doc_id"), col("sig")).distinct()
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def bandsOf(sig: Seq[Long]): Seq[Seq[Long]] = sig.grouped(RPB).toSeq
    def nMatch(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    def collide(a: Seq[Long], b: Seq[Long]): Boolean =
      bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y }

    val cs = sigs(corpus); val bs = sigs(batch)
    val expCorpus = bs.collect {
      case (id, s) if cs.values.exists(c => collide(s, c) && nMatch(s, c) >= minMatches) => id
    }.toSet
    val expNew = bs.collect {
      case (id, s) if bs.exists { case (oid, o) =>
        oid < id && collide(s, o) && nMatch(s, o) >= minMatches } => id
    }.toSet

    val got = IncrementalDedup
      .screenVerified(
        batch, IncrementalDedup.buildIndexWithSignatures(corpus, K, NH, RPB),
        K, NH, RPB, minJ)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got.size == batchRows.size)
    batchRows.map(_._1).foreach { id =>
      assert(got(id)._1 == (if (expCorpus.contains(id)) 1 else 0), s"dup_of_corpus doc $id")
      assert(got(id)._2 == (if (expNew.contains(id)) 1 else 0), s"dup_within_new doc $id")
    }
    assert(got(200L)._1 == 1) // the planted exact dup passes 16/16
    assert(got(201L) == ((0, 0)))
    // the threshold actually bit somewhere: some collision candidate
    // was rejected relative to the unverified screen
    val plain = IncrementalDedup
      .screen(batch, IncrementalDedup.buildIndex(corpus, K, NH, RPB), K, NH, RPB)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val rejected = batchRows.map(_._1).count(id =>
      (plain(id)._1 == 1 && got(id)._1 == 0) || (plain(id)._2 == 1 && got(id)._2 == 0))
    assert(rejected > 0, "generator produced no sub-threshold collision; weaken the corpus")
  }
}
