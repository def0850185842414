package graft.ts

import graft.SparkSpec

class AcfSpec extends SparkSpec {
  import spark.implicits._

  test("alternating series: acf(1) = -1, acf(2) = +1 scaled by the pair count") {
    // x = +1,-1,+1,-1,... mean 0: num_1 = -(n-1), num_2 = +(n-2), den = n
    val n = 10
    val rows = (0 until n).map(i => ("u", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val got = Acf.acf(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", maxLag = 2)
      .collect().map(r => r.getInt(2) -> r.getDouble(4)).toMap
    assert(got(1) == BigDecimal(-(n - 1).toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2) == BigDecimal((n - 2).toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("constant series: zero variance gives NULL acf, not NaN") {
    val rows = (0 until 5).map(i => ("u", i.toLong, 7.0))
    val got = Acf.acf(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", maxLag = 1).collect()
    assert(got.length == 1 && got.head.isNullAt(4))
  }

  test("short series: lag beyond length gives NULL with n_pairs 0") {
    val rows = Seq(("u", 0L, 1.0), ("u", 1L, 2.0))
    val got = Acf.acf(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", maxLag = 3)
      .collect().map(r => r.getInt(2) -> (r.getLong(3), r.isNullAt(4))).toMap
    assert(got(1)._1 == 1L)
    assert(got(2) == ((0L, true)))
    assert(got(3) == ((0L, true)))
  }

  test("matches a driver-side reference on a keyed pseudo-random series; partitioning-invariant") {
    val xs = (0 until 200).map { i =>
      val key = s"u${i % 3}"
      // deterministic 2dp values
      (key, i.toLong, ((i * 2654435761L) % 1000).toDouble / 100.0)
    }
    def ref(vals: Seq[Double], k: Int): Double = {
      // the operator reads values at 2dp DECIMAL — mirror that exactly
      val exact = vals.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val mean = BigDecimal(exact.sum.toDouble / vals.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val dev = vals.map(_ - mean)
      def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val den = dev.map(d => r12(d * d)).sum
      val num = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => r12(a * b) }.sum
      BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val df = xs.toDF("k", "ts", "v")
    val got = Acf.acf(df, Seq("k"), "ts", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(4)).toMap
    val byKey = xs.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    byKey.foreach { case (key, vals) =>
      (1 to 3).foreach { k =>
        assert(got((key, k)) == ref(vals, k), s"key=$key lag=$k")
      }
    }
    val re = Acf.acf(df.repartition(13), Seq("k"), "ts", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(4)).toMap
    assert(re == got)
  }
}
