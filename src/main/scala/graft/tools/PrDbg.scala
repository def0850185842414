package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timing for the q_pagerank driver path at a given sf dir. */
object PrDbg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      println(f"[${(System.nanoTime() - t0) / 1e9}%7.2f] $tag")
    val o = graft.model.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = graft.model.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val arcs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .agg(count(lit(1)).cast("double").as("w"))
      .select(
        explode(array(
          struct(concat(lit("c"), col("cust")).as("src"), concat(lit("s"), col("supp")).as("dst"), col("w")),
          struct(concat(lit("s"), col("supp")).as("src"), concat(lit("c"), col("cust")).as("dst"), col("w"))
        )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    lap("plan built")
    val n = arcs.count(); lap(s"arcs count = $n")
    val rows = arcs.collect(); lap(s"collected ${rows.length}")
    val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
    val es = rows.map(r => (id(r.get(0)), id(r.get(1)), r.getDouble(2)))
    lap(s"indexed ${idx.size} nodes")
    var rank = Array.fill(idx.size)(1.0 / idx.size)
    val outW = new Array[Double](idx.size)
    es.foreach { case (s, _, w) => outW(s) += w }
    (1 to 5).foreach { _ =>
      val next = Array.fill(idx.size)(0.15 / idx.size)
      es.foreach { case (s, t, w) => next(t) += 0.85 * rank(s) * (w / outW(s)) }
      rank = next
    }
    lap("loop done")
    spark.stop()
  }
}
