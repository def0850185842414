package graft.ops

import graft.SparkSpec
import graft.functions.DotI8
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Deterministic pseudo-random embeddings: 40 vectors of dim 8 in two
    * well-separated clusters, so exact and quantized top-k agree on the
    * cluster structure. */
  private def embeddings() = {
    val rows = (0 until 40).map { i =>
      val centre = if (i % 2 == 0) 1.0f else -1.0f
      val v = (0 until 8).map { j =>
        centre + 0.05f * (((i * 31 + j * 17) % 13) - 6)
      }.toArray
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("quantize: components bounded by ±127 and the max-abs component hits exactly ±127") {
    val q = Sq.quantize(embeddings())
    val rows = q.select("qvec").collect().map(_.getSeq[Byte](0))
    rows.foreach { v =>
      assert(v.forall(b => b >= -127 && b <= 127), v.mkString(","))
      assert(v.exists(b => b == 127 || b == -127), s"max-abs must map to ±127: ${v.mkString(",")}")
    }
  }

  test("quantized self-cosine is exactly 1 (scales cancel)") {
    val q = Sq.quantize(embeddings())
    val got = q.select(Sq.cosineQ(col("qvec"), col("qvec"), col("qsq"), col("qsq")).as("c"))
      .collect().map(_.getDouble(0))
    // sqrt(s)*sqrt(s) is not bit-exactly s: allow 1 ulp-scale slack
    got.foreach(c => assert(math.abs(c - 1.0) < 1e-12, c.toString))
  }

  test("DotI8: codegen == interpreted == plain Scala fold, incl. null elements") {
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType
    val data = Seq(
      (Seq[Byte](1, -2, 3), Seq[Byte](4, 5, -6)),
      (Seq[Byte](127, 127, -127), Seq[Byte](127, -127, 127)),
      (Seq[Byte](), Seq[Byte]()),
      (Seq[Byte](7), Seq[Byte](3, 9)) // ragged: min-length semantics
    )
    val df = data.toDF("a", "b")
    val got = df.select(DotI8.dot(col("a"), col("b")).as("d")).collect().map(_.getLong(0))
    val want = data.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    }
    assert(got.toSeq == want)
    // null element nulls the row
    val withNull = Seq(1).toDF("x").select(
      DotI8.dot(
        array(lit(1).cast("tinyint"), lit(null).cast("tinyint")),
        array(lit(2).cast("tinyint"), lit(3).cast("tinyint"))).as("d"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("quantized top-k recalls the exact f32 top-k on clustered data") {
    val e = embeddings()
    val queries = e.where(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qz = Sq.quantize(e)
    val got = Sq.topK(qz, qz.where(col("vec_id") < 3), k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall: exact=$exact got=$got")
  }

  test("topKIvf at full probing equals brute-force SQ8 topK; partial probing recalls the clusters") {
    val e = embeddings()
    val (assigned, cents) = Ivf.assignCells(e, nLists = 4)
    val assignedQ = Sq.quantize(assigned).select("vec_id", "cell", "qvec", "qsq")
    val queries = Sq.quantize(e.where(col("vec_id") < 3), dropInput = false)
    val qz = Sq.quantize(e)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    val full = rows(Sq.topKIvf(assignedQ, cents, queries, k = 5, nProbe = 4))
    val brute = rows(Sq.topK(qz, qz.where(col("vec_id") < 3), k = 5))
    assert(full == brute)

    // partial probing: the query's own cluster cells dominate its top-k
    val partial = Sq.topKIvf(assignedQ, cents, queries, k = 5, nProbe = 2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds intersect partial).size.toDouble / bruteIds.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("all-zero vector quantizes to zeros without dividing by zero") {
    val df = Seq((0L, Array.fill(4)(0.0f)), (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = Sq.quantize(df).orderBy("vec_id").collect()
    assert(q(0).getSeq[Byte](q(0).fieldIndex("qvec")).forall(_ == 0))
    assert(q(0).getAs[Long]("qsq") == 0L)
    assert(q(1).getSeq[Byte](q(1).fieldIndex("qvec")).toSeq == Seq[Byte](127, 0, 0, 0))
  }

  test("a zero-norm corpus vector never enters any top-k (its NaN cosine is excluded)") {
    val base = embeddings()
    val zero = Seq((999L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val qz = Sq.quantize(base.unionByName(zero))
    val got = Sq.topK(qz, qz.where(col("vec_id") < 2), k = 50)
    assert(!got.select("vec_id").collect().map(_.getLong(0)).contains(999L))
    // and a zero-norm QUERY produces no rows rather than NaN ranks
    val zq = Sq.topK(qz, qz.where(col("vec_id") === 999L), k = 5)
    assert(zq.count() == 0L)
  }
}
