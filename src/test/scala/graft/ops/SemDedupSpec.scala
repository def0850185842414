package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("verdict matches a brute-force recomputation of the contract") {
    val e = Tables.embeddings(spark, dir)
    val (result, cents) = SemDedup.semDedup(e, nLists = 4, minCosine = 0.3)
    val got = result
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3))))
      .toMap

    // brute-force expectation on the driver, from the same centroids
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def cell(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      cents.indices.foreach { c =>
        var d = 0.0; var j = 0
        while (j < cents(c).length) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        dp += a(j).toDouble * b(j); na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j)
        j += 1
      }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cells = rows.map { case (id, v) => id -> cell(v) }.toMap
    rows.foreach { case (id, v) =>
      val nbrs = rows.filter { case (o, w) =>
        o < id && cells(o) == cells(id) && cos(v, w) >= 0.3
      }
      val expected =
        if (nbrs.isEmpty) (cells(id), 0, -1L)
        else (cells(id), 1, nbrs.map(_._1).min)
      assert(got(id) == expected, s"vec $id")
    }
    // the threshold bites both ways on this data
    assert(got.values.exists(_._2 == 1) && got.values.exists(_._2 == 0))
  }

  test("dedup verdict is invariant to input partitioning and row order") {
    val e = Tables.embeddings(spark, dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      SemDedup.semDedup(df, nLists = 4, minCosine = 0.3)._1
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(canon(e) == canon(e.orderBy(col("vec_id").desc).repartition(7)))
  }

  test("raising the threshold only shrinks the dup set (monotone)") {
    val e = Tables.embeddings(spark, dir)
    val cents = Ivf.trainCentroids(e, nLists = 4)
    val assigned = e.withColumn(
      "cell", graft.functions.ArgminCell.argminCell(col("embedding"), cents))
    def dupIds(t: Double) = SemDedup.semDedupAssigned(assigned, t)
      .where(col("is_dup") === 1).collect().map(_.getLong(0)).toSet
    val loose = dupIds(0.2)
    val tight = dupIds(0.5)
    assert(tight.subsetOf(loose))
  }

  test("exact-collapse plan is identical to the all-pairs form on a duplicate-heavy corpus") {
    import spark.implicits._
    // 4 distinct vectors x many exact copies, two cells (zero-norm
    // vectors are an ANSI divide-by-zero error in BOTH forms — callers
    // filter them, as the embeddings contract states)
    val base = Seq(
      Array(1.0f, 0.0f), Array(0.9f, 0.1f), Array(-1.0f, 0.0f), Array(0.1f, -0.9f))
    val rows = (0L until 40L).map { id =>
      (id, base((id % 4).toInt), (id % 2).toInt) // cells split the copies too
    }.toDF("vec_id", "embedding", "cell")
    for (thr <- Seq(0.3, 0.99, 1.1)) {
      val fast = SemDedup.semDedupAssigned(rows, thr)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      val slow = SemDedup.semDedupAssignedAllPairs(rows, thr)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      assert(fast == slow, s"thr=$thr")
      // thr=1.1: even exact copies are not dups (rounded self-cos 1.0 < 1.1)
      if (thr > 1.0) assert(fast.forall(_._3 == 0))
    }
    // with thr<=1 every non-first copy is a dup of its group minimum
    val got = SemDedup.semDedupAssigned(rows, 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(4L) == 0L && got(37L) == 1L) // 4 copies 0; 37%4==1 -> first id 1
  }

  test("NULL-embedding rows survive the collapse as keepers, matching the all-pairs form") {
    import spark.implicits._
    val rows = Seq(
      (0L, Some(Array(1.0f, 0.0f)), 0),
      (1L, Some(Array(1.0f, 0.0f)), 0),
      (2L, None: Option[Array[Float]], 0) // null embedding -> keeper in both forms
    ).toDF("vec_id", "embedding", "cell")
    val fast = SemDedup.semDedupAssigned(rows, 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    val slow = SemDedup.semDedupAssignedAllPairs(rows, 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(fast == slow)
    assert(fast.contains((2L, 0, -1L)))
  }

  test("semDedup threads minCosine through to the verdict") {
    val e = graft.model.Tables.embeddings(spark, dir)
    val loose = SemDedup.semDedup(e, nLists = 2, minCosine = 0.2)._1
      .where(org.apache.spark.sql.functions.col("is_dup") === 1).count()
    val tight = SemDedup.semDedup(e, nLists = 2, minCosine = 0.9)._1
      .where(org.apache.spark.sql.functions.col("is_dup") === 1).count()
    assert(tight < loose, s"tight=$tight loose=$loose — minCosine ignored?")
  }
}
