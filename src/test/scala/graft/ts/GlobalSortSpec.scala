package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GlobalSort.rankByValueBuckets]] — total-order contract on skewed,
  * tied, and degenerate inputs. */
class GlobalSortSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ranks(rows: Seq[(Long, Long)], n: Int = 4): Seq[(Long, Long, Long)] =
    GlobalSort.rankByValueBuckets(rows.toDF("id", "ts"), "ts", Seq("id"), numBuckets = n)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq

  test("ranks are 0-based, contiguous, and agree with a driver sort incl. ties on ts") {
    val rows = Seq((5L, 30L), (1L, 10L), (2L, 10L), (7L, 99L), (3L, 10L), (4L, 50L))
    val got = ranks(rows)
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, ts), i) => (i.toLong, id, ts) }
    assert(got == want)
  }

  test("all-identical timestamps land in one bucket; tiebreak column orders them") {
    val rows = (0L until 20L).map(id => (19L - id, 42L))
    val got = ranks(rows)
    assert(got.map(_._2) == (0L until 20L))
    assert(got.map(_._1) == (0L until 20L))
  }

  test("heavily skewed values still produce a correct total order") {
    // 90% of values in one tiny range + outliers at the extremes
    val rows = (0L until 90L).map(i => (i, 1000L + i % 3)) ++
      Seq((900L, 0L), (901L, Long.MaxValue / 2))
    val got = ranks(rows, n = 8)
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, ts), i) => (i.toLong, id, ts) }
    assert(got == want)
  }

  test("NULL timestamps are rejected with a clear error, not silent NULL ranks") {
    val df = Seq((1L, Some(10L)), (2L, None: Option[Long])).toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      GlobalSort.rankByValueBuckets(df, "ts", Seq("id")).collect()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("a range overflowing Long arithmetic fails fast instead of wrapping buckets") {
    val df = Seq((1L, Long.MinValue / 2 - 10L), (2L, Long.MaxValue / 2 + 10L)).toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      GlobalSort.rankByValueBuckets(df, "ts", Seq("id")).collect()
    }
    assert(e.getMessage.contains("range"))
  }

  test("empty input yields empty output with the rank column") {
    val df = GlobalSort.rankByValueBuckets(
      Seq.empty[(Long, Long)].toDF("id", "ts"), "ts", Seq("id"))
    assert(df.columns.contains("rank") && df.count() == 0)
  }
}
