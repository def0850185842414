package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Pins the [[SpaceSavingTopK]] mergeable Misra-Gries contract:
  * bit-exact equality with the exact operator in the err = 0 regime,
  * and the [est, est + err] / guaranteed-presence bounds under forced
  * compaction. */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")

  test("exact regime: err = 0 and results equal the exact operator, any partitioning") {
    val exact = Text.topNgrams(docs, n = 3, k = 10)
      .orderBy("source", "rank").collect().toSeq
    Seq(docs, docs.repartition(7), docs.orderBy(col("doc_id").desc)).foreach { d =>
      val sk = Text.topNgramsSketch(d, n = 3, k = 10, capacity = 1 << 17)
      val rows = sk.orderBy("source", "rank").collect().toSeq
      assert(rows.forall(_.getAs[Long]("err") == 0L))
      assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(4))) ==
        exact.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))))
    }
  }

  test("compaction regime: bounds contain the truth, heavy hitters survive") {
    // skewed synthetic stream: token t0 dominates, long tail of uniques
    val rows = (0 until 4).flatMap { p =>
      (0 until 2000).map { i =>
        val tok = if (i % 4 != 3) s"h${i % 3}" else s"u$p-$i" // 3 heavy + tail
        (p.toLong * 2000 + i, tok, "s")
      }
    }
    val df = rows.toDF("doc_id", "text", "source").repartition(4)
    val truth = df.groupBy("text").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.size.toLong
    val capacity = 64
    val sk = df
      .groupBy("source")
      .agg(SpaceSavingTopK.topkSketch(col("text"), capacity).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sk.nonEmpty && sk.length <= 2 * capacity)
    val err = sk.head._3
    assert(err > 0L, "fixture must force compaction")
    sk.foreach { case (item, est, e) =>
      val t = truth(item)
      assert(est <= t && t <= est + e, s"$item: est=$est err=$e true=$t")
    }
    // the MG guarantee: every item with true count > err is present
    val present = sk.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (t > err) assert(present(item), s"heavy hitter $item (true=$t > err=$err) missing")
    }
    // the three engineered heavy hitters each have ~n/4 occurrences — far
    // above any err this capacity can accumulate (err ≤ n/capacity)
    assert(err <= n / capacity)
    Seq("h0", "h1", "h2").foreach(h => assert(present(h)))
  }

  test("summary serde round-trips") {
    val s = new TopKSketch.Summary(8)
    import org.apache.spark.unsafe.types.UTF8String
    Seq("a", "b", "a", "c", "a", "b").foreach(t => s.add(UTF8String.fromString(t), 1L))
    val agg = SpaceSavingTopK(org.apache.spark.sql.graftbridge.Bridge
      .expression(col("x")), 8)
    val back = agg.deserialize(agg.serialize(s))
    assert(back.deducted == s.deducted)
    assert(back.counts.size() == s.counts.size())
    assert(back.counts.get(UTF8String.fromString("a"))(0) == 3L)
  }
}
