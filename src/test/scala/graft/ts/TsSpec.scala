package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Timestamp-algebra operators against the reference's docstring
  * micro-fixtures (SURVEY.md §5). */
class TsSpec extends SparkSpec {
  import spark.implicits._

  // get_contiguous_segments docstring (jagular/utils.py:143-149):
  // [1,2,3,4,10,11,12], step=1, gap=2*step → segments [1,5) and [10,13).
  private val fixture = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L)

  test("sessionize global: docstring fixture segments") {
    val df = fixture.toDF("ts")
    val seg = Sessionize.withSegmentIdGlobal(df, "ts", gapThreshold = 2L, numPartitions = 3)
    val out = Sessionize
      .segments(seg, "ts", step = 1L)
      .orderBy("segment_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 5L, 4L), (1L, 10L, 13L, 3L)))
  }

  test("sessionize global matches single-window result on random data") {
    val rnd = new scala.util.Random(7)
    var t = 0L
    val ts = (1 to 500).map { _ => t += 1 + rnd.nextInt(10); t }
    val df = ts.toDF("ts")
    val viaGlobal = Sessionize
      .segments(Sessionize.withSegmentIdGlobal(df, "ts", 6L, numPartitions = 7), "ts", 1L)
      .orderBy("segment_id").collect().map(_.toSeq).toSeq
    // oracle: same computation with a 1-key keyed window
    val viaWindow = Sessionize
      .segments(
        Sessionize.withSegmentIdKeyed(df.withColumn("k", lit(1)), "ts", 6L, Seq("k")).drop("k"),
        "ts", 1L)
      .orderBy("segment_id").collect().map(_.toSeq).toSeq
    assert(viaGlobal == viaWindow)
  }

  test("sessionize keyed: per-key ids restart at 0") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 50L), ("b", 5L), ("b", 100L))
      .toDF("k", "ts")
    val seg = Sessionize.withSegmentIdKeyed(df, "ts", 10L, Seq("k"))
    val out = seg.orderBy("k", "ts").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 50L, 1L), ("b", 5L, 0L), ("b", 100L, 1L)))
  }

  test("dedup keep-first keeps the row with the smallest tiebreak") {
    val df = Seq((10L, 1L, "x"), (10L, 0L, "y"), (20L, 5L, "z")).toDF("ts", "pos", "v")
    val out = Dedup.keepFirst(df, Seq("ts"), Seq("pos")).orderBy("ts")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((10L, "y"), (20L, "z")))
  }

  test("gap fill: linear interpolation with exact endpoints") {
    val df = Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (5L, 8.0), (6L, 9.0)).toDF("ts", "v")
    val out = GapFill.linear(df, "ts", "v", step = 1L, maxGapSize = 5L)
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (0L, 0.0, 0), (1L, 1.0, 0), (2L, 2.0, 0),
      (3L, 4.0, 1), (4L, 6.0, 1), // linear between (2,2) and (5,8)
      (5L, 8.0, 0), (6L, 9.0, 0)))
  }

  test("gap fill: gaps over maxGapSize are NOT filled") {
    val df = Seq((0L, 0.0), (10L, 10.0)).toDF("ts", "v")
    val out = GapFill.linear(df, "ts", "v", step = 1L, maxGapSize = 5L)
    assert(out.count() == 2)
  }

  test("gap fill honors step > 1") {
    // ts in units of 2: missing 4 → one interpolated row
    val df = Seq((0L, 0.0), (2L, 2.0), (6L, 6.0)).toDF("ts", "v")
    val out = GapFill.linear(df, "ts", "v", step = 2L, maxGapSize = 3L)
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((0L, 0.0), (2L, 2.0), (4L, 4.0), (6L, 6.0)))
  }

  test("gap fill: off-grid gaps get their partial on-grid fills, not a crash") {
    import graft.ts.GapFill
    // step=2: ts 4 -> 7 is a 3-long off-grid gap; its single on-grid
    // interior point t=6 IS filled (clamped sequence stop), and a
    // length-(step+1) gap like 11 -> 14 (stop clamps to 13 -> only t=13)
    // never produces start > stop.
    val df = Seq((4L, 1.0), (7L, 2.0), (11L, 3.0), (14L, 4.0)).toDF("ts", "v")
    val out = GapFill.linear(df, "ts", "v", step = 2L, maxGapSize = 5L, keys = Nil)
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq == Seq((4L, 0), (6L, 1), (7L, 0), (9L, 1), (11L, 0), (13L, 1), (14L, 0)))
  }

  test("validation report on EMPTY input yields zeros, not nulls") {
    import graft.ts.Validation
    val empty = Seq.empty[(Long, Long)].toDF("ts_us", "event_id")
    val r = Validation.report(empty, "ts_us", "event_id").collect()(0)
    assert(r.getLong(0) == 0L) // n_rows
    assert(r.getLong(2) == 0L) // n_out_of_order (coalesced)
    assert(r.getInt(3) == 1)   // is_sorted
  }

  test("duplicates report lists keys with multiplicity > 1") {
    val df = Seq(10L, 10L, 10L, 20L, 30L, 30L).toDF("ts")
    val out = Dedup.duplicates(df, Seq("ts")).orderBy("ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, 3L), (30L, 2L)))
  }

  test("median step estimate over global and keyed orders") {
    val df = Seq(0L, 1L, 2L, 3L, 13L).toDF("ts") // diffs 1,1,1,10 → median 1
    val step = Sessionize.medianStep(df, "ts").first().getDouble(0)
    assert(step == 1.0)
    val keyed = Seq(("a", 0L), ("a", 2L), ("a", 4L), ("b", 0L), ("b", 10L))
      .toDF("k", "ts")
    val step2 = Sessionize.medianStep(keyed, "ts", Seq("k")).first().getDouble(0)
    assert(step2 == 2.0) // per-key diffs [2,2] and [10] → median of [2,2,10] = 2
  }

  test("gap lengths between consecutive segments") {
    val segs = Seq((0L, 1L, 5L), (1L, 10L, 13L), (2L, 50L, 60L))
      .toDF("segment_id", "start", "stop")
    val out = Sessionize.gapLengths(segs).orderBy("segment_id")
      .collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(out.toSeq == Seq(None, Some(5L), Some(37L)))
  }

  test("validation report flags dups and disorder") {
    val df = Seq((0L, 5L), (1L, 3L), (2L, 5L), (3L, 9L)).toDF("pos", "ts")
    val r = Validation.report(df, "ts", "pos").collect()(0)
    assert(r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("n_dup_rows") == 1)
    assert(r.getAs[Long]("n_out_of_order") == 1)
    assert(r.getAs[Int]("is_sorted") == 0)
    assert(r.getAs[Int]("has_dups") == 1)
  }

  test("property: stats-pass report == neighbor-exchange report, incl. NULL ts") {
    (1 to 6).foreach { trial =>
      val rnd = new scala.util.Random(trial * 6151)
      val rows = (0L until (20 + rnd.nextInt(120)).toLong).map { pos =>
        val ts: java.lang.Long =
          if (rnd.nextInt(20) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
        (pos, ts)
      }
      val df = rows.toDF("pos", "ts").repartition(1 + rnd.nextInt(6))
      def canon(out: org.apache.spark.sql.DataFrame) =
        out.collect()(0).toSeq
      val fast = canon(Validation.report(df, "ts", "pos"))
      val legacy = canon(Validation.reportViaNeighbors(df, "ts", "pos"))
      assert(fast == legacy, s"trial=$trial rows=${rows.take(20)}")
    }
  }
}
