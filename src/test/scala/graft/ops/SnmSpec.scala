package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Snm]] — sorted-neighborhood dedup: the windowed candidate set
  * must equal the single-window reference on every partitioning, the
  * byte-prefix bucketing must respect the key total order on nasty
  * keys (control chars, multibyte, prefixes), and the candidate count
  * must be exactly the data-independent n·(w−1) − w(w−1)/2. */
class SnmSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("matchPairs: hand-computed window-2 fixture") {
    val df = Seq(
      (1L, "alpha"), (2L, "alphb"), (3L, "alpz"), (4L, "beta"), (5L, "betas")
    ).toDF("id", "key")
    val got = Snm.matchPairs(df, "id", "key", window = 2, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("candidatePairs ≡ single-window reference across partitionings; exact count") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i => (i.toLong, f"key${rnd.nextInt(60)}%04d${('a' + i % 3).toChar}"))
    val w = 4
    // reference: one global sort, all pairs within w-1 positions
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    val expected = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.size)
    } yield (sorted(i)._1, sorted(j)._1)).toSet
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("id", "key").repartition(parts)
      val got = Snm.candidatePairs(df, "id", "key", w)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
      assert(got.size == 400 * (w - 1) - w * (w - 1) / 2)
    }
  }

  test("byte-prefix bucketing respects key order on control chars, multibyte, and prefixes") {
    // "a" is a prefix of "a\tb" and of "a b"; tab (0x09) < space
    // (0x20) < any printable — NUL padding must keep padded order =
    // key order. Multibyte (é, 0xC3A9) and an empty key join in.
    val keys = Seq("", "a", "a\tb", "a b", "ab", "abcdefghij", "abcdefghiz", "café", "cafe")
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val ranked = graft.ts.GlobalSort.rankByValueBuckets(
      df.withColumn("__kn", Snm.bytePrefix56(col("key"))), "__kn", Seq("key", "id"))
    val byRank = ranked.orderBy("rank").collect().map(_.getString(1)).toSeq
    // UTF8 bytewise order is what Spark's string ordering implements —
    // sortBy on the JVM side must agree for pure-ASCII-vs-multibyte too
    val expected = df.orderBy("key", "id").collect().map(_.getString(1)).toSeq
    assert(byRank == expected)
  }

  test("window must be >= 2; null keys are dropped, not ranked") {
    intercept[IllegalArgumentException] {
      Snm.candidatePairs(Seq((1L, "x")).toDF("id", "key"), "id", "key", window = 1)
    }
    val df = Seq((1L, Some("aa")), (2L, None), (3L, Some("ab"))).toDF("id", "key")
    val got = Snm.matchPairs(df, "id", "key", window = 2, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
  }
}
