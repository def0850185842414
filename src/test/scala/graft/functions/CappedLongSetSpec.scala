package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.Text
import org.apache.spark.sql.functions._

/** [[CappedLongSet]] — the saturating distinct-set aggregate behind the
  * exact-pairs pre-shed. */
class CappedLongSetSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("cappedSet equals when(size(collect_set) <= cap, sort_array(collect_set)) under any partitioning") {
    // groups straddling the cap: sizes 1, cap, cap+1, cap+5; duplicate
    // rows and NULL inputs mixed in (collect_set semantics)
    val cap = 4
    val rows = Seq.tabulate(60) { i =>
      val g = i % 6
      val v: java.lang.Long = if (i % 13 == 0) null else (i % (g + cap)).toLong
      (g.toLong, v)
    }
    Seq(1, 7, 32).foreach { nPart =>
      val df = rows.toDF("g", "v").repartition(nPart)
      val got = df.groupBy("g")
        .agg(CappedLongSet.cappedSet(col("v"), cap).as("s"))
        .collect().map(r => (r.getLong(0), Option(r.getSeq[Long](1)).map(_.toSeq))).toMap
      val ref = df.groupBy("g")
        .agg(sort_array(collect_set(col("v"))).as("cs"))
        .select(col("g"), when(size(col("cs")) <= cap, col("cs")).as("s"))
        .collect().map(r => (r.getLong(0), Option(r.getSeq[Long](1)).map(_.toSeq))).toMap
      assert(got == ref, s"nPart=$nPart")
    }
  }

  test("saturated groups return NULL (not a truncated list) and small groups the full sorted set") {
    val df = (Seq.tabulate(10)(i => (1L, i.toLong)) ++ Seq((2L, 5L), (2L, 3L), (2L, 5L)))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(CappedLongSet.cappedSet(col("v"), 4).as("s"))
      .collect().map(r => (r.getLong(0), Option(r.getSeq[Long](1)).map(_.toSeq))).toMap
    assert(got(1L).isEmpty)              // 10 distinct > cap 4 → NULL
    assert(got(2L).contains(Seq(3L, 5L))) // deduped + sorted
  }

  test("winnowOverlapPairs (capped kernel) is row-identical to the collect_set formulation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // a low cap so BOTH branches (kept + saturated buckets) are exercised
    Seq(3, 50).foreach { cap =>
      val kern = canon(Text.winnowOverlapPairs(docs, k = 3, w = 4, minShared = 3, maxDocFreq = cap))
      val ref = canon(Text.winnowOverlapPairsCollect(docs, k = 3, w = 4, minShared = 3, maxDocFreq = cap))
      assert(kern == ref, s"cap=$cap")
      if (cap == 50) assert(kern.nonEmpty) // the q_winnow_pairs config finds pairs at sf0.001
    }
  }
}
