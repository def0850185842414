package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-19 driver-lane return-tail A/B (VERDICT r18 #7): a driver
  * kernel's result frame can return as a parallelize-backed scan (the
  * r14–r18 convention) or as a LocalRelation. Times the caller-side
  * noop for both at representative graph-result sizes, plus a
  * broadcast-join consumer (the modularity shape). */
object R19LocalRelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(
      StructField("node", StringType, nullable = false),
      StructField("val", LongType, nullable = false)))
    def rows(n: Int): Array[InternalRow] = (0 until n).map { i =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s"n$i"), i.toLong)): InternalRow
    }.toArray

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 7).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"STAGE $label%-34s min ${ts.min}%.4f s  (med ${ts.sorted.apply(3)}%.4f)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (n <- Seq(100, 2000, 150000)) {
      val rs = rows(n)
      time(s"parallelize n=$n noop") {
        noop(Bridge.internalCreateDataFrame(
          spark, spark.sparkContext.parallelize(rs.toSeq, math.max(1, n / 500000)), schema))
      }
      time(s"localrel    n=$n noop") {
        noop(Bridge.localRelationDataFrame(spark, rs.toIndexedSeq, schema))
      }
      // consumer-join shape: a 10k-row distributed side joins the result
      val big = spark.range(10000).selectExpr("concat('n', id % 1000) as node", "id as w")
      time(s"parallelize n=$n join-consumer") {
        noop(big.join(graft.spikes.Spikes.broadcastIfSmall(
          Bridge.internalCreateDataFrame(
            spark, spark.sparkContext.parallelize(rs.toSeq, math.max(1, n / 500000)), schema),
          n.toLong), "node"))
      }
      time(s"localrel    n=$n join-consumer") {
        noop(big.join(
          Bridge.localRelationDataFrame(spark, rs.toIndexedSeq, schema), "node"))
      }
    }
    spark.stop()
  }
}
