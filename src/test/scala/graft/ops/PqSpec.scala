package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pq]] product quantization: encode/ADC semantics pinned against
  * hand computation, deterministic training, quantization quality
  * ordering, and the recall of the shortlist+rerank serving shape
  * against exact L2 on a clustered corpus. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic clustered corpus: `n` vectors of dim `dim` drawn
    * around `nClusters` integer-grid centers with a seeded PRNG. */
  private def clustered(n: Int, dim: Int, nClusters: Int, seed: Long, sigma: Double) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextInt(10).toDouble)
    (0L until n.toLong).map { i =>
      val c = centers(rnd.nextInt(nClusters))
      (i, c.map(x => (x + rnd.nextGaussian() * sigma).toFloat).toSeq)
    }
  }

  test("pq_encode matches a hand argmin and pq_adc matches a hand LUT sum") {
    // 1 subspace of dim 2, 3 codewords — hand-checkable
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(5.0, 5.0)))
    val df = Seq(
      (0L, Seq(0.1f, 0.2f)),   // nearest (0,0) -> code 0
      (1L, Seq(0.9f, 1.2f)),   // nearest (1,1) -> code 1
      (2L, Seq(4.0f, 4.5f))    // nearest (5,5) -> code 2
    ).toDF("vec_id", "embedding")
    val codes = Pq.encode(df, cb).select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(codes(0L) == Seq(0.toByte))
    assert(codes(1L) == Seq(1.toByte))
    assert(codes(2L) == Seq(2.toByte))

    val q = Array(0.5, 0.5)
    val lut = Pq.lutFor(q, cb)
    assert(math.abs(lut(0) - 0.5) < 1e-12)  // (0.5² + 0.5²)
    assert(math.abs(lut(1) - 0.5) < 1e-12)
    assert(math.abs(lut(2) - 40.5) < 1e-12) // (4.5² + 4.5²)
    val adc = Pq.encode(df, cb)
      .withColumn("lut", typedLit(lut.toSeq))
      .select(col("vec_id"), graft.functions.PqAdc.pqAdc(col("code"), col("lut")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(adc(0L) - 0.5) < 1e-12)
    assert(math.abs(adc(1L) - 0.5) < 1e-12)
    assert(math.abs(adc(2L) - 40.5) < 1e-12)
  }

  test("encode edge semantics: wrong length and null input yield NULL codes") {
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val df = Seq(
      (0L, Some(Seq(0.1f, 0.2f))),
      (1L, Some(Seq(0.1f))),  // wrong dim
      (2L, None)
    ).toDF("vec_id", "embedding")
    val got = Pq.encode(df, cb).select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(0L).isDefined)
    assert(got(1L).isEmpty)
    assert(got(2L).isEmpty)
  }

  test("training is deterministic and repartition-invariant") {
    val data = clustered(500, 8, 4, seed = 7L, sigma = 0.3)
    val df = data.toDF("vec_id", "embedding")
    val a = Pq.train(df, m = 2, ksub = 4, sampleSize = 400, iters = 4)
    val b = Pq.train(df.repartition(13), m = 2, ksub = 4, sampleSize = 400, iters = 4)
    assert(a.length == b.length)
    a.indices.foreach { s =>
      assert(a(s).map(_.toSeq).toSeq == b(s).map(_.toSeq).toSeq, s"subspace $s")
    }
  }

  test("more codewords reconstruct better (mean ADC self-distance falls)") {
    val data = clustered(600, 8, 6, seed = 21L, sigma = 0.5)
    val df = data.toDF("vec_id", "embedding")
    // self-ADC: each vector scored against its own LUT approximates its
    // quantization error, so coarser codebooks must score worse
    def meanSelfDist(ksub: Int): Double = {
      val cb = Pq.train(df, m = 2, ksub = ksub, sampleSize = 600, iters = 6)
      val codes = Pq.encode(df, cb).select("vec_id", "code").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      data.map { case (id, emb) =>
        val lut = Pq.lutFor(emb.map(_.toDouble).toArray, cb)
        val code = codes(id)
        code.indices.map(s => lut(s * ksub + (code(s) & 0xff))).sum
      }.sum / data.length
    }
    val coarse = meanSelfDist(2)
    val fine = meanSelfDist(16)
    assert(fine < coarse, s"ksub=16 ($fine) should beat ksub=2 ($coarse)")
  }

  test("shortlist+rerank recovers exact L2 top-k on a clustered corpus") {
    val dim = 16
    val data = clustered(800, dim, 8, seed = 33L, sigma = 0.25)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 5)
    val cb = Pq.train(df, m = 4, ksub = 16, sampleSize = 800, iters = 6)
    val codes = Pq.encode(df, cb)

    // exact L2 top-10 (ground truth), same tie-break as the operator
    val exact = {
      val byId = data.toMap
      (0L until 5L).map { qid =>
        val q = byId(qid).map(_.toDouble)
        val top = data.filter(_._1 != qid).map { case (id, emb) =>
          val d = emb.zip(q).map { case (x, y) => val t = x - y; t * t }.sum
          (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        qid -> top
      }.toMap
    }

    def meanRecall(rerank: Int): Double = {
      val got = Pq.adcTopKReranked(codes, df, queries, cb, k = 10, rerank = rerank)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      (0L until 5L).map(qid => (exact(qid) intersect got(qid)).size / 10.0).sum / 5.0
    }
    // codes quantize away WITHIN-cluster order (same-cell vectors share
    // codes), so recall is governed by shortlist depth vs the ambiguity
    // group (~cluster size 100 here): deepening the rerank shortlist
    // must recover the exact answer — the defining PQ serving trade
    val r1 = meanRecall(1)
    val r4 = meanRecall(4)
    val r12 = meanRecall(12)
    assert(r1 <= r4 && r4 <= r12, s"recall not monotone in rerank depth: $r1, $r4, $r12")
    assert(r12 >= 0.9, s"mean recall@10 $r12 < 0.9 at rerank=12 (1: $r1, 4: $r4)")
  }

  test("residual encode: hand-checkable code for a known cell assignment") {
    // centroid (10,10); residual codebook words (0,0) and (1,1)
    val cents = Array(Array(10.0, 10.0))
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val df = Seq(
      (0L, Seq(10.1f, 10.2f)),  // residual (0.1,0.2) -> word 0
      (1L, Seq(11.1f, 10.9f))   // residual (1.1,0.9) -> word 1
    ).toDF("vec_id", "embedding")
    val got = Pq.encodeIvfPq(df, cents, cb)
      .select("vec_id", "cell", "code").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(got(0L) == ((0, Seq(0.toByte))))
    assert(got(1L) == ((0, Seq(1.toByte))))
  }

  test("IVF-PQ beats plain PQ on tight clusters and reaches exact with full probe") {
    val dim = 16
    val data = clustered(800, dim, 8, seed = 33L, sigma = 0.25)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 5)

    val exact = Pq.l2TopK(df, queries, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }

    // plain PQ at the same budget
    val cbFlat = Pq.train(df, m = 4, ksub = 64, sampleSize = 800, iters = 6)
    val rFlat = recallOf(
      Pq.adcTopKReranked(Pq.encode(df, cbFlat), df, queries, cbFlat, k = 10, rerank = 4))

    // IVF-PQ: 8 coarse cells (matching the generator), residual codes
    val cents = Ivf.trainCentroids(df, nLists = 8, sampleSize = 800, iters = 6)
    val cbRes = Pq.trainResidual(df, cents, m = 4, ksub = 64, sampleSize = 800, iters = 6)
    val index = Pq.encodeIvfPq(df, cents, cbRes).select("vec_id", "cell", "code")
    val rIvfPq = recallOf(
      Pq.ivfPqTopK(index, df, queries, cents, cbRes, k = 10, nProbe = 2, rerank = 4))
    assert(rIvfPq > rFlat,
      s"residual coding should beat flat PQ on tight clusters: ivfpq=$rIvfPq flat=$rFlat")
    assert(rIvfPq >= 0.8, s"IVF-PQ recall@10 $rIvfPq < 0.8 at nProbe=2, rerank=4")

    // full probe + deep rerank must recover the exact result entirely
    val rFull = recallOf(
      Pq.ivfPqTopK(index, df, queries, cents, cbRes, k = 10, nProbe = 8, rerank = 80))
    assert(rFull == 1.0, s"full probe + exhaustive rerank recall $rFull != 1.0")
  }
}
