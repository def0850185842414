package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ranks(pairs: (Long, Int)*) =
    pairs.toSeq.toDF("doc_id", "rank")

  test("rrfFuse sums reciprocal ranks for docs in both lists, single-list docs get one term") {
    val lex = ranks(1L -> 1, 2L -> 2, 3L -> 3)
    val dense = ranks(2L -> 1, 4L -> 2)
    val got = Hybrid.rrfFuse(lex, dense, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // doc 2: 1/62 + 1/61; doc 1: 1/61; doc 4: 1/62; doc 3: 1/63
    val e2 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(got.head == ((2L, 2, 1, e2)))
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
    // sentinels for the one-sided docs
    assert(got.find(_._1 == 1L).get._3 == -1)
    assert(got.find(_._1 == 4L).get._2 == -1)
  }

  test("rrfFuse k truncates after the deterministic (rrf desc, doc_id) order") {
    val lex = ranks(1L -> 1, 2L -> 2)
    val dense = ranks(3L -> 1, 4L -> 2)
    // doc1==doc3 rrf (rank 1 each), doc2==doc4 (rank 2): doc_id breaks ties
    val got = Hybrid.rrfFuse(lex, dense, k = 3).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 2L))
  }

  test("withRank is 1-based in the given order") {
    val df = Seq((10L, 0.5), (20L, 0.9), (30L, 0.5)).toDF("doc_id", "score")
    val got = Hybrid.withRank(df, Seq(col("score").desc, col("doc_id").asc))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(got == Map(20L -> 1, 10L -> 2, 30L -> 3))
  }

  test("fusing a list with itself doubles every contribution") {
    val l = ranks(1L -> 1, 2L -> 2)
    val got = Hybrid.rrfFuse(l, l, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(got(1L) == math.rint(2.0 / 61 * 1e6) / 1e6)
    assert(got(2L) == math.rint(2.0 / 62 * 1e6) / 1e6)
  }
}
