package graft.spikes

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Spikes.framesGlobal]] (the scalable keyless frame gather) against the
  * single-task `Window.orderBy` formulation it replaces — same values on
  * every row, including frames that straddle partition boundaries, frames
  * wider than whole partitions, null values, and empty partitions. */
class FramesGlobalSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.orderBy(col("idx")).rowsBetween(-k, k - 1)
    df.withColumn("patch", collect_list(col("v")).over(w))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val expected = viaWindow(df, k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2))
      .toMap
    val got = Spikes
      .framesGlobal(df, "idx", "v", k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2))
      .toMap
    assert(got == expected)
  }

  test("matches the single-task window on a dense stream, many partitions") {
    // 4 shuffle partitions (SparkSpec config) over 200 rows: every
    // partition boundary exercises the pad exchange
    val df = (0L until 200L).map(i => (i, math.sin(i.toDouble))).toDF("idx", "v")
    assertSame(df, 3)
    assertSame(df, 1)
  }

  test("frames wider than whole partitions walk across them") {
    // 10 rows over 4 range partitions (~3 rows each) with halfWidth 7:
    // every pad must be stitched from MULTIPLE upstream partitions
    val df = (0L until 10L).map(i => (i, i.toDouble * 2)).toDF("idx", "v")
    assertSame(df, 7)
  }

  test("null values are skipped, collect_list-style") {
    val df = (0L until 50L)
      .map(i => (i, if (i % 5 == 0) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(i.toDouble)))
      .toDF("idx", "v")
    val expected = viaWindow(df, 2)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2))
      .toMap
    val got = Spikes
      .framesGlobal(df, "idx", "v", 2)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2))
      .toMap
    assert(got == expected)
  }

  test("sparse irregular idx (empty range partitions) still exact") {
    // huge gaps → range partitioner leaves some partitions nearly/fully
    // empty; frame semantics are ROW-based so values must still chain
    val idxs = Seq(1L, 2L, 1000000L, 1000001L, 5000000L, 9000000L, 9000001L, 9000002L)
    val df = idxs.map(i => (i, i.toDouble % 97)).toDF("idx", "v")
    assertSame(df, 2)
    assertSame(df, 5)
  }

  test("no single-task ordered Window in the physical plan") {
    val df = (0L until 100L).map(i => (i, i.toDouble)).toDF("idx", "v")
    val plan = Spikes.framesGlobal(df, "idx", "v", 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
