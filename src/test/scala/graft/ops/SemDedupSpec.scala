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
}
