package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end parity of the ZERO-SHUFFLE extract path (disjoint file
  * time-ranges → gap-fill runs directly on the scan splits) against the
  * forced range-shuffle path, through REAL multi-file `.rec` sessions:
  * duplicate timestamps at file boundaries, fillable gaps and epoch
  * breaks crossing file boundaries, and the shuffle fallback for
  * overlapping files. */
class ZeroShuffleExtractSpec extends SparkSpec {

  private def mkSession(files: Seq[Seq[(Long, Int => Short)]]): Seq[String] = {
    val dir = Files.createTempDirectory("zeroshuffle").toFile.getPath
    files.zipWithIndex.map { case (packets, i) =>
      val p = s"$dir/part_$i.rec"
      RecSynth.write(p, packets)
      p
    }
  }

  private def v(ts: Long): Int => Short = c => ((ts + c) % 1000).toShort

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .orderBy("channel", "ts")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getShort(4)))
    .toList

  private def extractBoth(paths: Seq[String], maxGap: Long) = {
    val fused = ExtractChannels.extract(spark, paths, maxGapSize = maxGap)
    // the forced-shuffle reference: same scan, shuffle mode
    val raw = RecScan.read(spark, paths)
    val shuffled = PacketGapFill.fillAndSegmentExploded(
      raw, maxGap, dedupTieBreak = Seq("file_rank", "pos"))
    (canon(fused.select("segment_id", "ts", "interpolated", "channel", "value")),
      canon(shuffled.select("segment_id", "ts", "interpolated", "channel", "value")))
  }

  test("disjoint files: boundary dup + cross-file gap + cross-file break") {
    val paths = mkSession(Seq(
      // file 0: ts 0..9
      (0L to 9L).map(t => (t, v(t))),
      // file 1: starts with a DUP of file 0's last ts, then a fillable
      // gap 10 -> 13 inside, ends at 20
      Seq((9L, v(999L))) ++ Seq((10L, v(10L)), (13L, v(13L))) ++ (14L to 20L).map(t => (t, v(t))),
      // file 2: fillable gap ACROSS the file boundary (20 -> 23), then an
      // epoch break (30 -> 300, maxGap 5)
      Seq((23L, v(23L)), (24L, v(24L)), (30L, v(30L)), (300L, v(300L)))
    ))
    val (fused, shuffled) = extractBoth(paths, maxGap = 5L)
    assert(fused == shuffled)
    // dup at ts=9 kept FIRST (file 0's values, not file 1's v(999))
    val ts9 = fused.filter(t => t._2 == 9L && t._4 == 0)
    assert(ts9.map(_._5).toSet == Set(((9L + 0) % 1000).toShort))
    // cross-file gap interpolated: 21, 22 present and flagged
    assert(fused.exists(t => t._2 == 21L && t._3 == 1))
    assert(fused.exists(t => t._2 == 22L && t._3 == 1))
    // break opened a second segment at ts=300
    assert(fused.filter(_._2 == 300L).map(_._1).distinct == List(1L))
  }

  test("single file is always the zero-shuffle path and matches") {
    val paths = mkSession(Seq(
      (0L to 5L).map(t => (t, v(t))) ++ Seq((9L, v(9L))) // gap 5 -> 9 filled
    ))
    val (fused, shuffled) = extractBoth(paths, maxGap = 5L)
    assert(fused == shuffled)
    assert(fused.exists(t => t._2 == 7L && t._3 == 1))
  }

  test("randomized multi-file session across real scan splits matches the shuffle path") {
    val rnd = new scala.util.Random(90210)
    var t = 0L
    val files = (0 until 5).map { _ =>
      val packets = scala.collection.mutable.ArrayBuffer.empty[(Long, Int => Short)]
      (0 until 4000).foreach { _ =>
        packets += ((t, v(t)))
        if (rnd.nextInt(50) == 0) packets += ((t, v(t + 7))) // dup (second loses)
        t += (rnd.nextInt(30) match {
          case 0 => 2L + rnd.nextInt(3) // fillable gap (maxGap 4)
          case 1 => 200L // epoch break
          case _ => 1L
        })
      }
      // occasionally end a file with a dup of its own last ts, so the
      // NEXT file can start at that exact ts (boundary dup across files)
      val out = packets.toSeq
      if (rnd.nextBoolean()) { t -= 1 } // next file starts AT this file's last ts
      out
    }
    val paths = mkSession(files)
    // force many small splits so file-interior split boundaries exist too
    val raw = RecScan.read(spark, paths, targetSplitBytes = 64L * 73)
    def canonDf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("segment_id", "interpolated")
      .agg(
        count(lit(1)).as("n"),
        sum(col("ts")).as("ts_sum"),
        sum(col("value").cast("long")).as("v_sum")
      )
      .orderBy("segment_id", "interpolated")
      .collect()
      .map(_.toSeq)
      .toList
    val sorted = canonDf(PacketGapFill.fillAndSegmentExploded(
      raw, 4L, dedupTieBreak = Seq("file_rank", "pos"), alreadySorted = true))
    val shuffled = canonDf(PacketGapFill.fillAndSegmentExploded(
      raw, 4L, dedupTieBreak = Seq("file_rank", "pos")))
    assert(sorted == shuffled)
    assert(sorted.nonEmpty)
  }

  test("OVERLAPPING files fall back to the shuffle path and stay correct") {
    val paths = mkSession(Seq(
      (0L to 10L).map(t => (t, v(t))),
      (5L to 15L).map(t => (t, v(t + 1))) // overlaps file 0 in [5, 10]
    ))
    val (fused, shuffled) = extractBoth(paths, maxGap = 3L)
    assert(fused == shuffled)
    // dups in the overlap deduped to one row per (ts, channel)
    val perTs = fused.filter(_._4 == 0).groupBy(_._2).view.mapValues(_.size)
    assert(perTs.values.forall(_ == 1))
  }
}
