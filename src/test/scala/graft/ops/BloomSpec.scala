package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("zero false negatives: every true member survives the screen") {
    val small = (0 until 200).map(i => i * 7L).toDF("key")
    val big = (0 until 5000).map(_.toLong).toDF("key")
    val screened = Bloom.screen(big, "key", small, "key", m = 1 << 16, k = 3)
      .collect().map(_.getLong(0)).toSet
    val members = (0 until 200).map(i => i * 7L).filter(_ < 5000).toSet
    assert(members.subsetOf(screened), s"missing: ${members -- screened}")
  }

  test("false positive rate is near the textbook bound at the sized load") {
    // n = 500 keys, m = 2^16 bits, k = 3: fpr ≈ (1 - e^(-kn/m))^k ≈ 4e-6·...
    val n = 500
    val small = (0 until n).map(i => s"member_$i").toDF("key")
    val words = Bloom.buildWords(small, "key", m = 1 << 16, k = 3)
    val probes = (0 until 100000).map(i => s"absent_$i").toDF("key")
    val fp = probes.where(Bloom.mightContain(col("key"), words, 1 << 16, 3)).count()
    val expect = math.pow(1 - math.exp(-3.0 * n / (1 << 16)), 3) * 100000
    assert(fp <= expect * 10 + 10, s"fp=$fp vs expected ≈ $expect")
  }

  test("deterministic: the same keys build the same words regardless of partitioning") {
    val keys = (0 until 300).map(i => s"k$i")
    val a = Bloom.buildWords(keys.toDF("key"), "key", 1 << 12, 4)
    val b = Bloom.buildWords(keys.reverse.toDF("key").repartition(13), "key", 1 << 12, 4)
    assert(a.toSeq == b.toSeq)
  }

  test("parameter guards: non-power-of-two m, hash-bit overflow, length mismatch") {
    val df = Seq("a").toDF("key")
    intercept[IllegalArgumentException](Bloom.buildWords(df, "key", m = 1000, k = 3))
    intercept[IllegalArgumentException](Bloom.buildWords(df, "key", m = 1 << 24, k = 3))
    val words = Bloom.buildWords(df, "key", 1 << 12, 3)
    intercept[IllegalArgumentException](
      Bloom.mightContain(col("key"), words.drop(1), 1 << 12, 3))
  }

  test("screen keeps every column of the big side and drops NULL keys") {
    val small = Seq(1L).toDF("k")
    val big = Seq(
      (java.lang.Long.valueOf(1L), "keep-maybe"),
      (null.asInstanceOf[java.lang.Long], "null-drops")
    ).toDF("k", "payload")
    val got = Bloom.screen(big, "k", small, "k", 1 << 12, 3).collect()
    assert(got.map(_.getString(1)).toSet == Set("keep-maybe"))
  }
}
