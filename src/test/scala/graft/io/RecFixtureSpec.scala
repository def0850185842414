package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `.rec` hard-oracle chain (q_rec_catalog / q_rec_session /
  * q_rec_extract): fixture determinism, driver-decode ≡ distributed-scan
  * consistency (the oracle's VALUES twin is decodeRaw's output, so this
  * IS the query↔oracle input identity), and an independent in-test
  * Scala re-implementation of the sanitize semantics mirroring the
  * DuckDB oracle SQL — keep-first, epoch breaks, trunc-toward-zero
  * linear interpolation — checked row-for-row against the real
  * extract pipeline over the fixture files. */
class RecFixtureSpec extends SparkSpec {

  test("fixture generation is deterministic and idempotent") {
    val paths1 = RecFixture.ensure()
    val bytes1 = paths1.map(p => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq)
    val paths2 = RecFixture.ensure()
    assert(paths1 == paths2)
    val bytes2 = paths2.map(p => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq)
    assert(bytes1 == bytes2)
  }

  test("driver-side decodeRaw matches the distributed RecScan row-for-row") {
    val paths = RecFixture.ensure()
    val viaScan = RecScan
      .read(spark, paths, targetSplitBytes = 1L << 12) // force multiple splits
      .select("file_rank", "pos", "ts", "values")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getSeq[Short](3).toList))
      .sortBy(t => (t._1, t._2))
    val viaDriver = RecFixture
      .decodeRaw(paths)
      .map { case (r, p, ts, vs) => (r, p, ts, vs.toList) }
      .sortBy(t => (t._1, t._2))
    assert(viaScan.toSeq == viaDriver)
  }

  test("sample-data decodeRaw agrees with the catalog bounds and counts") {
    val samples = (1 to 5).map(i => s"/root/reference/sample_data/sample_data_$i.rec")
    val raw = RecFixture.decodeRaw(samples)
    val byFile = raw.groupBy(_._1).toSeq.sortBy(_._1)
    assert(byFile.map(_._1) == Seq(0, 1, 2, 3, 4))
    val cat = RecScan.catalog(spark, samples).orderBy("file_rank").collect()
    byFile.foreach { case (rank, rows) =>
      val sorted = rows.sortBy(_._2)
      val c = cat(rank)
      assert(c.getAs[Long]("start_ts") == sorted.head._3, s"file $rank start")
      assert(c.getAs[Long]("stop_ts") == sorted.last._3, s"file $rank stop")
      assert(c.getAs[Long]("n_packets") == rows.size.toLong, s"file $rank count")
    }
  }

  test("extract over the fixture matches an independent sanitize oracle") {
    val paths = RecFixture.ensure()
    val maxGap = RecFixture.maxGapSize
    val brk = maxGap + 2

    // independent oracle, mirroring the DuckDB SQL: keep-first by
    // (file_rank, pos) per ts; segment breaks at diff >= maxGap+2;
    // interp runs of <= maxGap missing with double math + toShort trunc
    val raw = RecFixture.decodeRaw(paths)
    val keep = raw
      .groupBy(_._3)
      .map { case (ts, rows) => ts -> rows.minBy(r => (r._1, r._2))._4 }
      .toSeq
      .sortBy(_._1)
    var seg = 0L
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int, Short)]
    keep.zipWithIndex.foreach { case ((ts, vals), i) =>
      if (i > 0 && ts - keep(i - 1)._1 >= brk) seg += 1
      vals.zipWithIndex.foreach { case (v, c) => expected += ((seg, ts, 0, c, v)) }
      if (i + 1 < keep.length) {
        val (nt, nv) = keep(i + 1)
        val d = nt - ts
        if (d > 1 && d <= maxGap + 1) {
          (ts + 1 until nt).foreach { t =>
            vals.indices.foreach { c =>
              val x = (vals(c) + (t - ts).toDouble * (nv(c) - vals(c)) / d.toDouble).toShort
              expected += ((seg, t, 1, c, x))
            }
          }
        }
      }
    }

    val got = ExtractChannels
      .extract(spark, paths, maxGapSize = maxGap)
      .select("segment_id", "ts", "interpolated", "channel", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getShort(4)))
      .sortBy(t => (t._2, t._4, t._3))
    val exp = expected.sortBy(t => (t._2, t._4, t._3))
    assert(got.length == exp.length, s"${got.length} vs ${exp.length}")
    assert(got.toSeq == exp.toSeq)
    // the planted shapes actually fired: >1 segment, both interp signs,
    // and the cross-file gap (ts 1120) present
    assert(exp.map(_._1).distinct.size == 4)
    assert(got.exists(t => t._2 == 1120L && t._3 == 1))
    assert(got.exists(t => t._3 == 1 && t._5 < 0) && got.exists(t => t._3 == 1 && t._5 > 0))
  }

  test("rec queries return the SparkEntry-declared shapes") {
    val cat = graft.SparkEntry.queries("q_rec_catalog")(spark, "unused")
    assert(cat.columns.toSeq == Seq("file_rank", "start_ts", "stop_ts", "n_packets"))
    assert(cat.count() == 5)
    val ses = graft.SparkEntry.queries("q_rec_session")(spark, "unused")
    assert(ses.count() == 1)
    val ex = graft.SparkEntry.queries("q_rec_extract")(spark, "unused")
    assert(ex.columns.toSeq == Seq("segment_id", "ts", "interpolated", "channel", "value"))
    assert(ex.where(col("interpolated") === 1).count() > 0)
    // oracle SQL entries exist for all three
    Seq("q_rec_catalog", "q_rec_session", "q_rec_extract").foreach { q =>
      assert(graft.SparkEntry.oracleSql.contains(q), q)
    }
  }
}
