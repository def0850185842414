package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bq]] — sign-bit packing exactness, Hamming vs a Scala reference,
  * and the full binary pipeline's equivalence to the exact IVF serving
  * path when the shortlist covers the corpus. */
class BqSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("packSignBits: MSB-first words, short final word, zero is not positive") {
    val df = Seq(Tuple1(Seq(1.0f, -1.0f, 0.0f, 2.0f, -3.0f))).toDF("emb")
    val got = df.select(Bq.packSignBits(col("emb"), 5)).head().getSeq[Long](0)
    // bits (1,0,0,1,0) MSB-first over one short word = 0b10010
    assert(got == Seq(18L))
    // dim 33 → two words, second word has one bit
    val v = Seq.tabulate(33)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val got2 = Seq(Tuple1(v)).toDF("emb")
      .select(Bq.packSignBits(col("emb"), 33)).head().getSeq[Long](0)
    val w0 = (0 until 32).foldLeft(0L)((acc, j) => acc * 2 + (if (j % 2 == 0) 1L else 0L))
    assert(got2 == Seq(w0, 1L))
  }

  test("hamming over packed codes equals the bit-level reference on seeded vectors") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val vecs = Seq.fill(20)(Seq.fill(dim)(rnd.nextFloat() - 0.5f))
    def bits(v: Seq[Float]): Seq[Int] = v.map(x => if (x > 0) 1 else 0)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
      .withColumn("code", Bq.packSignBits(col("emb"), dim))
    val a = df.as("a"); val b = df.as("b")
    val got = a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), Bq.hamming(col("a.code"), col("b.code")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    vecs.indices.foreach { i =>
      (i + 1 until vecs.size).foreach { j =>
        val want = bits(vecs(i)).zip(bits(vecs(j))).count { case (x, y) => x != y }.toLong
        assert(got((i.toLong, j.toLong)) == want, s"pair ($i,$j)")
      }
    }
  }

  test("topKBinaryIndexed with corpus-wide shortlist equals the exact IVF serving path") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val emb = (0 until 60).map { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(dim)(j => (if (j % 3 == c) 1.0f else -0.2f) + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val (assigned, centroids) = Ivf.assignCells(emb, nLists = 4)
    val queries = emb.where(col("vec_id") < 3)
    val exact = Ivf.topKIndexed(assigned, centroids, queries, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaBq = Bq.topKBinaryIndexed(
      assigned, centroids, queries, dim, k = 5, nProbe = 4, hammingR = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaBq == exact)
  }

  test("a tight Hamming shortlist still recovers clustered neighbors (recall sanity)") {
    val dim = 32
    val emb = (0 until 90).map { i =>
      val c = i % 3
      // well-separated clusters: sign pattern determined by cluster
      (i.toLong, Seq.tabulate(dim)(j => if ((j + c) % 3 == 0) 1.0f else -1.0f)
        .updated(10 + c, 0.5f + i * 1e-4f))
    }.toDF("vec_id", "embedding")
    val (assigned, centroids) = Ivf.assignCells(emb, nLists = 3)
    val queries = emb.where(col("vec_id") < 2)
    val got = Bq.topKBinaryIndexed(
      assigned, centroids, queries, dim, k = 5, nProbe = 3, hammingR = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every returned neighbor shares the query's cluster (same residue)
    got.foreach { case (q, v) => assert(v % 3 == q % 3, s"query $q got off-cluster $v") }
    assert(got.groupBy(_._1).forall(_._2.size == 5))
  }
}
