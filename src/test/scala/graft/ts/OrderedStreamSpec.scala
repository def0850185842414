package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class OrderedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("withNeighbors matches keyless window lag/lead on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i.toLong * 3 + rnd.nextInt(2), rnd.nextDouble()))
      .distinctBy(_._1)
    val df = rows.toDF("ts", "v").repartition(7)
    val viaTwoPass = OrderedStream
      .withNeighbors(df, "ts", Seq("v"), numPartitions = 5)
      .select(col("ts"), col("__prev_ts"), col("__next_ts"), col("__prev_v"), col("__next_v"))
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
    val w = Window.orderBy("ts")
    val viaWindow = df
      .withColumn("pt", lag("ts", 1).over(w))
      .withColumn("nt", lead("ts", 1).over(w))
      .withColumn("pv", lag("v", 1).over(w))
      .withColumn("nv", lead("v", 1).over(w))
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
    assert(viaTwoPass.toSeq == viaWindow.toSeq)
  }

  test("withNeighbors: single partition and empty-partition edge cases") {
    val df = Seq((1L, "a"), (5L, "b"), (9L, "c")).toDF("ts", "s")
    val out = OrderedStream.withNeighbors(df, "ts", Seq("s"), numPartitions = 8)
      .select("ts", "__prev_ts", "__next_ts")
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString)))
    assert(out.toSeq == Seq(
      (1L, None, Some("5")),
      (5L, Some("1"), Some("9")),
      (9L, Some("5"), None)
    ))
  }
}
