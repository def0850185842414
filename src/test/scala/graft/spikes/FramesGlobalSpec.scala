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

  test("keyed window-gather joins peaks on their key, matching the range-join form") {
    // two channels with distinct values at the same idx range: a peak on
    // channel 0 must gather ONLY channel-0 samples
    val samples = (0L until 20L).flatMap(i =>
      Seq((0, i, i.toDouble), (1, i, 1000.0 + i))).toDF("ch", "idx", "v")
    val peaks = Seq((0, 10L), (1, 15L)).toDF("ch", "idx")
    val viaWindow = Spikes
      .extractPatchesWindow(samples, peaks, "idx", "v", halfWidth = 2, keys = Seq("ch"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toList)
      .toMap
    assert(viaWindow.keySet == Set((0, 10L), (1, 15L))) // one patch per (key, peak)
    assert(viaWindow((0, 10L)) == List(8.0, 9.0, 10.0, 11.0))
    assert(viaWindow((1, 15L)) == List(1013.0, 1014.0, 1015.0, 1016.0))
    val viaJoin = Spikes
      .extractPatches(samples, peaks, "idx", "v", halfWidth = 2, keys = Seq("ch"))
      .groupBy("ch", "peak_idx")
      .agg(sort_array(collect_list(struct(col("offset"), col("value")))).as("p"))
      .select(col("ch"), col("peak_idx"), expr("transform(p, x -> x.value)").as("patch"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toList)
      .toMap
    assert(viaWindow == viaJoin)
  }
}
