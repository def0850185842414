package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Round-19 q_rules / q_item_pairs kernel experiment (VERDICT r18 ask
  * #1): times the current collect_set + nested-transform pair pipeline
  * against (a) the DedupDocs posexplode+slice pair-generation shape and
  * (b) a sorted-run streaming kernel (repartition by basket +
  * sortWithinPartitions + one mapPartitions pass emitting pairs — no
  * per-basket array materialization at all), with exact-parity checks.
  */
object R19ItemProbe {

  /** Variant (b): one exchange on basket, per-partition sort, stream
    * runs — dedupe adjacent items, shed baskets outside [2, cap], emit
    * canonical pairs. Items arrive sorted so pairs are canonical. */
  def pairsKernel(raw: DataFrame, maxBasketSize: Int): DataFrame = {
    val spark = raw.sparkSession
    val prepped = raw.repartition(col("__b")).sortWithinPartitions("__b", "__i")
    val iType = prepped.schema("__i").dataType
    val rdd = Bridge.toInternalRdd(prepped).mapPartitions { it =>
      new Iterator[InternalRow] {
        private val items = new scala.collection.mutable.ArrayBuffer[Any](32)
        private var curB: Any = null
        private var haveRun = false
        private var oversize = false
        private var pending: Array[InternalRow] = Array.empty
        private var pi = 0

        private def flush(): Unit = {
          if (haveRun && !oversize && items.length >= 2) {
            val m = items.length
            val out = new Array[InternalRow](m * (m - 1) / 2)
            var k = 0
            var i = 0
            while (i < m) {
              var j = i + 1
              while (j < m) {
                val r = new GenericInternalRow(2)
                r.update(0, items(i))
                r.update(1, items(j))
                out(k) = r
                k += 1
                j += 1
              }
              i += 1
            }
            pending = out
          } else pending = Array.empty
          pi = 0
          items.clear()
          oversize = false
        }

        private def advance(): Unit = {
          while (pi >= pending.length && it.hasNext) {
            val row = it.next()
            val b = row.get(0, LongType) // probe fixture: basket is long
            if (!haveRun || b != curB) {
              flush()
              curB = b
              haveRun = true
              items += InternalRow.copyValue(row.get(1, iType))
            } else if (!oversize) {
              val v = row.get(1, iType)
              if (items.isEmpty || items.last != v) {
                if (items.length >= maxBasketSize) { oversize = true; items.clear() }
                else items += InternalRow.copyValue(v)
              }
            }
          }
          if (pi >= pending.length && !it.hasNext && haveRun) {
            flush()
            haveRun = false
          }
        }

        def hasNext: Boolean = { advance(); pi < pending.length }
        def next(): InternalRow = { val r = pending(pi); pi += 1; r }
      }
    }
    val schema = StructType(Seq(
      StructField("item_a", iType, nullable = false),
      StructField("item_b", iType, nullable = false)))
    Bridge.internalCreateDataFrame(spark, rdd, schema)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def base = graft.model.Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("basket"),
      concat(lit("p"), (col("l_partkey") % 200).cast("string")).as("item"))
    def raw = base
      .where(col("basket").isNotNull && col("item").isNotNull)
      .select(col("basket").as("__b"), col("item").as("__i"))

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"STAGE $label%-34s min ${ts.min}%.3f s  (med ${ts.sorted.apply(2)}%.3f)")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // V0: current operator
    time("V0 coOccurrence (current)")(noop(
      graft.ops.Itemsets.coOccurrence(base, "basket", "item", 5L, 20)))

    // V0 stages
    def baskets = raw.groupBy("__b")
      .agg(sort_array(collect_set(col("__i"))).as("__arr"))
      .where(size(col("__arr")) <= 20 && size(col("__arr")) >= 2)
    time("V0a collect_set agg only")(noop(baskets))

    // V1: collect_set + posexplode/slice pair gen (DedupDocs shape)
    def v1 = baskets
      .select(posexplode(col("__arr")).as(Seq("__i0", "item_a")), col("__arr"))
      .select(col("item_a"),
        explode(slice(col("__arr"), col("__i0") + 2, size(col("__arr")))).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= 5)
    time("V1 posexplode pair gen")(noop(v1))

    // V2: sorted-run streaming kernel
    def v2 = pairsKernel(raw, 20)
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= 5)
    time("V2 sorted-run kernel")(noop(v2))

    // parity
    val v0df = graft.ops.Itemsets.coOccurrence(base, "basket", "item", 5L, 20)
    val d1 = v0df.except(v1).count() + v1.except(v0df).count()
    val d2 = v0df.except(v2).count() + v2.except(v0df).count()
    println(s"PARITY v1_diff=$d1 v2_diff=$d2 v0_rows=${v0df.count()}")

    // rules pipeline today, for the tail split
    time("rules full (current)")(noop(
      graft.ops.Itemsets.rules(base, "basket", "item", 5L, 20)))
    spark.stop()
  }
}
