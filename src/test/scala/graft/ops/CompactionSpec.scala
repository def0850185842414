package graft.ops

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("sequential fill over (bytes desc, name): groups near target, giants alone") {
    val files = Seq(
      ("giant.parquet", 250L),  // > target: alone in group 0... by fill order
      ("a.parquet", 60L), ("b.parquet", 60L), ("c.parquet", 50L),
      ("d.parquet", 40L), ("e.parquet", 10L)
    ).toDF("file", "bytes")
    val got = Compaction.planGroups(files, "file", "bytes", targetBytes = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // order: giant(250) a(60) b(60) c(50) d(40) e(10); cum-before:
    // 0, 250, 310, 370, 420, 460 -> groups 0, 2, 3, 3, 4, 4
    assert(got("giant.parquet")._1 == 0L)
    assert(got("a.parquet")._1 == 2L)
    assert(got("b.parquet") == ((3L, 110L, 2L)))
    assert(got("c.parquet") == ((3L, 110L, 2L)))
    assert(got("d.parquet") == ((4L, 50L, 2L)))
    assert(got("e.parquet") == ((4L, 50L, 2L)))
  }

  test("deterministic under partitioning; name breaks byte ties") {
    val files = (0 until 200).map(i => (f"f$i%03d", (i % 7 + 1) * 10L))
    val a = Compaction.planGroups(files.toDF("file", "bytes"), "file", "bytes", 64L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = Compaction.planGroups(
        files.reverse.toDF("file", "bytes").repartition(13), "file", "bytes", 64L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("NULL and negative sizes fail loud") {
    val bad = Seq(("x", -1L)).toDF("file", "bytes")
    val e = intercept[Exception](
      Compaction.planGroups(bad, "file", "bytes", 100L).collect())
    assert(e.getMessage != null)
  }
}
