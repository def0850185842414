package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IntervalJoin.containmentJoin]] — containment semantics and the
  * exactly-one-bucket-meeting guarantee (no dedup needed). */
class IntervalJoinSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val intervals = Seq(
    (10L, 0L, 10L),    // [0, 10)
    (20L, 5L, 25L),    // overlaps the first -> points 5..9 match both
    (30L, 100L, 101L), // width-1 interval
    (40L, 50L, 90L)    // spans many buckets at width 8
  ).toDF("iv_id", "start", "stop")

  private def join(points: Seq[Long], width: Long): Set[(Long, Long)] =
    IntervalJoin
      .containmentJoin(points.toDF("ts").withColumn("pid", col("ts")),
        intervals, "ts", "start", "stop", width)
      .select("pid", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment with overlaps, half-open bounds, and uncovered points") {
    val got = join(Seq(0L, 7L, 9L, 10L, 24L, 25L, 100L, 101L, 999L), width = 8L)
    assert(got == Set(
      (0L, 10L),            // start inclusive
      (7L, 10L), (7L, 20L), // overlap region -> both intervals
      (9L, 10L), (9L, 20L),
      (10L, 20L),           // stop of [0,10) exclusive
      (24L, 20L),           // last covered instant of [5,25)
      (100L, 30L)           // width-1 interval
      // 25, 101, 999 uncovered -> dropped
    ))
  }

  test("each qualifying pair appears EXACTLY once regardless of bucket width (long fan-out intervals)") {
    for (w <- Seq(1L, 3L, 8L, 64L, 1000L)) {
      val rows = IntervalJoin
        .containmentJoin(Seq(55L, 89L).toDF("ts"), intervals, "ts", "start", "stop", w)
        .collect()
      assert(rows.length == 2, s"width $w: ${rows.mkString(",")}") // both inside [50,90) only
    }
  }

  test("inverted and empty intervals explode to nothing instead of a descending bucket fan-out") {
    val bad = Seq((1L, 1000000L, 0L), (2L, 5L, 5L), (3L, 0L, 10L)).toDF("iv_id", "start", "stop")
    val got = IntervalJoin
      .containmentJoin(Seq(3L).toDF("ts"), bad, "ts", "start", "stop", bucketWidth = 2L)
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L)) // only the valid interval matches; no blow-up
  }

  test("the bucketized plan is an equi-join, not a nested loop") {
    val q = IntervalJoin.containmentJoin(
      spark.range(100).select(col("id").as("ts")),
      intervals, "ts", "start", "stop", bucketWidth = 8L)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlapJoin: exact pair set, each pair once, intersection columns") {
    val a = Seq(
      (1L, 0L, 10L),    // overlaps b1 [5,15) and b2 [9,12)
      (2L, 20L, 30L),   // touches b3 [30,40) only at the open edge → NO
      (3L, 100L, 200L)  // long interval spans many buckets; overlaps b4 once
    ).toDF("a_id", "as", "ae")
    val b = Seq(
      (10L, 5L, 15L), (20L, 9L, 12L), (30L, 30L, 40L), (40L, 150L, 160L)
    ).toDF("b_id", "bs", "be")
    val got = IntervalJoin
      .overlapJoin(a, b, "as", "ae", "bs", "be", bucketWidth = 7L)
      .select("a_id", "b_id", "overlap_start", "overlap_stop")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == Seq((1L, 10L, 5L, 10L), (1L, 20L, 9L, 10L), (3L, 40L, 150L, 160L)))
  }

  test("overlapJoin: keyed — same times on different keys never pair; matches naive join") {
    val a = spark.range(0, 400).select(
      (col("id") % 5).as("k"), col("id").as("a_id"),
      (col("id") * 3).as("as"), (col("id") * 3 + 10).as("ae"))
    val b = spark.range(0, 300).select(
      (col("id") % 5).as("k"), col("id").as("b_id"),
      (col("id") * 4 + 1).as("bs"), (col("id") * 4 + 7).as("be"))
    val got = IntervalJoin
      .overlapJoin(a, b, "as", "ae", "bs", "be", bucketWidth = 9L, keyCols = Seq("k"))
      .select("k", "a_id", "b_id")
    val naive = a.join(b, Seq("k"))
      .where(col("as") < col("be") && col("bs") < col("ae"))
      .select("k", "a_id", "b_id")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() == got.distinct().count()) // exactly-once emission
  }

  test("overlapJoin: empty/inverted intervals explode to nothing") {
    val a = Seq((1L, 10L, 10L), (2L, 50L, 40L), (3L, 0L, 5L)).toDF("a_id", "as", "ae")
    val b = Seq((9L, 0L, 100L)).toDF("b_id", "bs", "be")
    val got = IntervalJoin.overlapJoin(a, b, "as", "ae", "bs", "be", bucketWidth = 8L)
      .select("a_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }
}
