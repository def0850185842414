package graft.io

import graft.SparkSpec
import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class ChannelStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed channel tables join on ts without a shuffle exchange") {
    val a = (0L until 2000L).map(t => (t, (t % 100).toShort)).toDF("ts", "value")
    val b = (0L until 2000L).map(t => (t, (t % 7).toShort)).toDF("ts", "value")
    ChannelStore.writeBucketed(a, "ch_a", nBuckets = 8, partitionCols = Nil)
    ChannelStore.writeBucketed(b, "ch_b", nBuckets = 8, partitionCols = Nil)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ChannelStore
        .read(spark, "ch_a").as("a")
        .join(ChannelStore.read(spark, "ch_b").as("b"), "ts")
        .select(col("ts"), (col("a.value") + col("b.value")).as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ch_a")
      spark.sql("DROP TABLE IF EXISTS ch_b")
    }
  }

  test("salted join matches plain join results under a hot key") {
    // 90% of the big side shares one key
    val big = (0 until 5000).map(i => (if (i % 10 == 0) i % 50 else 7, i)).toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInner(big, small, "k", saltFrom = "payload", salts = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 5000)
  }
}
