package graft.io

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** [[PacketGapFill]]'s zero-shuffle `alreadySorted` mode against the
  * range-shuffle mode it shortcuts: identical output on duplicate-ts runs
  * STRADDLING partition boundaries (including runs spanning whole
  * partitions), gaps straddling boundaries, epoch breaks at boundaries,
  * and empty partitions — the cases the shuffle previously kept
  * partition-local by construction. */
class PacketGapFillSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("values", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("file_rank", IntegerType, nullable = false),
    StructField("pos", LongType, nullable = false)
  ))

  /** Build a packet stream with EXPLICIT partition slicing (parallelize
    * preserves element order and slice boundaries). */
  private def packetDf(tss: Seq[Long], nPart: Int): DataFrame = {
    val rows = tss.zipWithIndex.map { case (ts, i) =>
      Row(ts, Seq((ts % 100).toShort, ((ts + 1) % 100).toShort), 0, i.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, nPart), schema)
  }

  private def collectBoth(tss: Seq[Long], nPart: Int, maxGap: Long, dedup: Boolean) = {
    val df = packetDf(tss, nPart)
    val tie = if (dedup) Seq("file_rank", "pos") else Nil
    def canon(out: DataFrame) = out
      .orderBy("ts", "segment_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Short](1).toList, r.getLong(2), r.getInt(3)))
      .toList
    val shuffled = canon(PacketGapFill.fillAndSegment(df, maxGap, dedupTieBreak = tie))
    val sorted = canon(PacketGapFill.fillAndSegment(df, maxGap, dedupTieBreak = tie, alreadySorted = true))
    (shuffled, sorted)
  }

  test("dup runs straddling partition boundaries dedup identically") {
    // partitions of 3: [1,2,2 | 2,2,3 | 3,4,10] — runs of 2s and 3s
    // straddle both boundaries
    val tss = Seq(1L, 2L, 2L, 2L, 2L, 3L, 3L, 4L, 10L)
    val (shuffled, sorted) = collectBoth(tss, 3, maxGap = 3L, dedup = true)
    assert(sorted == shuffled)
    assert(sorted.count(_._4 == 0) == 5) // 1,2,3,4,10 kept
  }

  test("whole partitions of duplicates collapse to the upstream keeper") {
    // [5,5,5 | 5,5,5 | 5,9] — the run spans two full partitions; the gap
    // 5→9 must be interpolated exactly once, by the keeper's partition
    val tss = Seq(5L, 5L, 5L, 5L, 5L, 5L, 5L, 9L)
    val (shuffled, sorted) = collectBoth(tss, 3, maxGap = 5L, dedup = true)
    assert(sorted == shuffled)
    assert(sorted.map(_._1) == Seq(5L, 6L, 7L, 8L, 9L))
    assert(sorted.count(_._4 == 1) == 3)
  }

  test("gaps and epoch breaks straddling boundaries match") {
    // fillable gap 10→13 across the 1st boundary, break 13→100 across the
    // 2nd (maxGap 3 ⇒ breakAt 5)
    val tss = Seq(8L, 9L, 10L, 13L, 14L, 100L, 101L)
    for (nPart <- 1 to 5) {
      val (shuffled, sorted) = collectBoth(tss, nPart, maxGap = 3L, dedup = true)
      assert(sorted == shuffled, s"nPart=$nPart")
      assert(sorted.map(s => (s._1, s._3)).distinct == Seq(
        (8L, 0L), (9L, 0L), (10L, 0L), (11L, 0L), (12L, 0L),
        (13L, 0L), (14L, 0L), (100L, 1L), (101L, 1L)
      ), s"nPart=$nPart")
    }
  }

  test("empty partitions (more slices than rows) are handled") {
    val tss = Seq(1L, 2L, 2L, 7L)
    val (shuffled, sorted) = collectBoth(tss, 8, maxGap = 10L, dedup = true)
    assert(sorted == shuffled)
    assert(sorted.map(_._1) == (1L to 7L).toList)
  }

  test("non-dedup mode keeps equal-ts rows in both modes") {
    val tss = Seq(1L, 2L, 2L, 3L)
    val (shuffled, sorted) = collectBoth(tss, 2, maxGap = 3L, dedup = false)
    assert(sorted.map(_._1).sorted == shuffled.map(_._1).sorted)
    assert(sorted.count(_._1 == 2L) == 2)
  }

  test("property: random gap/dup streams agree across modes and slicings") {
    (1 to 6).foreach { trial =>
      val rnd = new scala.util.Random(trial * 104729)
      var t = rnd.nextInt(5).toLong
      val tss = scala.collection.mutable.ArrayBuffer.empty[Long]
      (0 until 60).foreach { _ =>
        val dups = 1 + (if (rnd.nextInt(4) == 0) rnd.nextInt(3) else 0)
        (0 until dups).foreach(_ => tss += t)
        t += (rnd.nextInt(4) match {
          case 0 => 1L
          case 1 => 1L + rnd.nextInt(3) // fillable gap (maxGap 4)
          case 2 => 1L
          case _ => if (rnd.nextInt(5) == 0) 50L else 1L // occasional break
        })
      }
      val nPart = 1 + rnd.nextInt(7)
      val (shuffled, sorted) = collectBoth(tss.toSeq, nPart, maxGap = 4L, dedup = true)
      assert(sorted == shuffled, s"trial=$trial nPart=$nPart tss=${tss.take(30)}...")
    }
  }

  test("fused exploded form == packet form + posexplode, both modes") {
    val tss = Seq(1L, 2L, 2L, 5L, 6L, 50L, 51L)
    val df = packetDf(tss, 3)
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .select("segment_id", "ts", "interpolated", "channel", "value")
      .orderBy("ts", "channel")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getShort(4)))
      .toList
    for (sortedMode <- Seq(false, true)) {
      val viaPacket = canon(
        PacketGapFill
          .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = sortedMode)
          .select(
            org.apache.spark.sql.functions.col("segment_id"),
            org.apache.spark.sql.functions.col("ts"),
            org.apache.spark.sql.functions.col("interpolated"),
            org.apache.spark.sql.functions
              .posexplode(org.apache.spark.sql.functions.col("values"))
              .as(Seq("channel", "value"))
          )
      )
      val viaFused = canon(
        PacketGapFill.fillAndSegmentExploded(
          df, 3L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = sortedMode)
      )
      assert(viaFused == viaPacket, s"sortedMode=$sortedMode")
    }
  }

  test("unsorted input under alreadySorted FALLS BACK to the shuffle mode, never wrong") {
    // a sorted-looking claim disproved by the data (the reference's own
    // sample recordings have out-of-order timestamps inside a file)
    val df = packetDf(Seq(5L, 3L, 7L, 3L), 1)
    val viaSortedClaim = PacketGapFill
      .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = true)
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getLong(2))).toList
    val viaShuffle = PacketGapFill
      .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos"))
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getLong(2))).toList
    assert(viaSortedClaim == viaShuffle)
    assert(viaSortedClaim.map(_._1) == Seq(3L, 4L, 5L, 6L, 7L)) // dedup'd + filled
  }

  test("equal-ts run out of tie-break order under alreadySorted falls back: keeper is the tie-break minimum, not stream-first") {
    // ts-sorted stream, but the dup run arrives pos=5 before pos=1 — the
    // shuffle mode's keeper is pos=1 (vals [20]); stream-first would
    // wrongly keep pos=5 (vals [10])
    val rows = Seq(
      Row(1L, Seq(1.toShort), 0, 0L),
      Row(2L, Seq(10.toShort), 0, 5L),
      Row(2L, Seq(20.toShort), 0, 1L),
      Row(3L, Seq(3.toShort), 0, 6L)
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    def canon(out: DataFrame) = out
      .orderBy("ts").collect().map(r => (r.getLong(0), r.getSeq[Short](1).toList)).toList
    val viaSortedClaim = canon(PacketGapFill
      .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = true))
    val viaShuffle = canon(PacketGapFill
      .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos")))
    assert(viaSortedClaim == viaShuffle)
    assert(viaSortedClaim.find(_._1 == 2L).get._2 == List(20.toShort))
  }

  test("tie-break violation STRADDLING a partition boundary is caught too") {
    // [1, 2(pos=5) | 2(pos=1), 3]: each partition is internally fine; only
    // the cross-boundary run order is wrong
    val rows = Seq(
      Row(1L, Seq(1.toShort), 0, 0L),
      Row(2L, Seq(10.toShort), 0, 5L),
      Row(2L, Seq(20.toShort), 0, 1L),
      Row(3L, Seq(3.toShort), 0, 6L)
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val kept2 = PacketGapFill
      .fillAndSegment(df, 3L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = true)
      .where("ts = 2").collect().map(_.getSeq[Short](1).toList).toList
    assert(kept2 == List(List(20.toShort)))
  }

  test("overlapping partitions under alreadySorted fall back to the shuffle mode") {
    // two partitions [10, 20 | 15, 25]: each sorted, ranges overlap
    val rows = Seq(10L, 20L, 15L, 25L).zipWithIndex.map { case (ts, i) =>
      Row(ts, Seq(1.toShort), 0, i.toLong)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = PacketGapFill
      .fillAndSegment(df, 6L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = true)
      .orderBy("ts").collect().map(_.getLong(0)).toList
    assert(out == (10L to 25L).toList) // gaps <= 6 all filled after re-sort
  }
}
