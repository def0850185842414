package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for q_profile (the suite's slowest query):
  * `runMain graft.tools.ProfileCostSplit [sfDir]`.
  *
  * q_profile is ONE map-side-combinable aggregate — the open question
  * is where its seconds go: the single-row-group scan floor, the
  * count/min/max/decimal-sum battery, or the KMV distinct sketch's
  * per-row `cast(string) + md5 + conv` hash. This probe times, warmed
  * median-of-5 on the same projected frame:
  *   scan        — per-column count only (reads all 6 columns, no hash)
  *   battery     — count/min/max/decimal-sum, NO KMV
  *   full        — the shipped q_profile battery (KMV over cast-string md5)
  *   kmv_long    — KMV where decimal columns hash their UNSCALED LONG's
  *                 string (micro-units) instead of the decimal's string
  *                 (exact DuckDB respelling: md5(CAST(CAST(v*100 AS
  *                 BIGINT) AS VARCHAR))) — skips Decimal.toBigDecimal
  *                 string materialization in the hot path.
  */
object ProfileCostSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def projected: DataFrame = graft.model.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"),
      col("l_quantity").cast("decimal(18,2)").as("quantity"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"),
      col("l_discount").cast("decimal(18,2)").as("discount"),
      col("l_returnflag"),
      col("l_linestatus"))

    val numeric = Seq("l_orderkey", "quantity", "price", "discount")
    val strings = Seq("l_returnflag", "l_linestatus")
    val all = numeric ++ strings
    val decimals = Set("quantity", "price", "discount")
    val k = 64

    def kmv(h: Column, name: String): Column =
      graft.functions.KMinValues.kMinValues(h, k).as(s"__${name}__kmv")

    def battery(name: String, isString: Boolean, kmvHash: Option[Column]): Seq[Column] = {
      val v = if (isString) length(col(name)) else col(name)
      Seq(
        count(col(name)).as(s"__${name}__nn"),
        min(v.cast("double")).as(s"__${name}__mn"),
        max(v.cast("double")).as(s"__${name}__mx"),
        sum(v.cast("decimal(38,6)")).as(s"__${name}__sm")
      ) ++ kmvHash.map(h => kmv(h, name))
    }

    def aggOf(exprs: Seq[Column]): DataFrame =
      projected.agg(count(lit(1)).as("__n"), exprs: _*)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => aggOf(all.map(c => count(col(c)).as(s"__${c}__nn")))),
      "battery" -> (() => aggOf(all.flatMap(c => battery(c, strings.contains(c), None)))),
      "full" -> (() => aggOf(all.flatMap(c => battery(c, strings.contains(c),
        Some(graft.ops.Cardinality.itemHash(col(c).cast("string"))))))),
      "kmv_long" -> (() => aggOf(all.flatMap { c =>
        val h =
          if (decimals.contains(c))
            graft.ops.Cardinality.itemHash((col(c) * 100).cast("long").cast("string"))
          else graft.ops.Cardinality.itemHash(col(c).cast("string"))
        battery(c, strings.contains(c), Some(h))
      })),
      // identical hash VALUES to "full", but the md5 chain runs in a
      // codegen'd projection BEFORE the aggregate, so the imperative
      // KMV agg's child is a bare column ref (TypedImperativeAggregate
      // evaluates its child interpreted, per row)
      "full_preproj" -> (() => {
        val withHash = all.foldLeft(projected) { (d, c) =>
          d.withColumn(s"__h_$c", graft.ops.Cardinality.itemHash(col(c).cast("string")))
        }
        withHash.agg(
          count(lit(1)).as("__n"),
          all.flatMap(c => battery(c, strings.contains(c), None) :+
            kmv(col(s"__h_$c"), c)): _*)
      }),
      // xxhash64 in place of the md5 chain — NOT oracle-replayable,
      // pure attribution: hash-function cost vs KMV-aggregate cost
      "kmv_xx" -> (() => aggOf(all.flatMap(c => battery(c, strings.contains(c),
        Some(xxhash64(col(c).cast("string"))))))),
      // the native Md5Top60 kernel: bit-identical values to "full",
      // no hex string / substring / conv parse
      "kmv_native" -> (() => aggOf(all.flatMap(c => battery(c, strings.contains(c),
        Some(graft.functions.Md5Top60.md5Top60(col(c).cast("string"))))))),
      // native kernel AND pre-projected out of the imperative agg
      "kmv_native_preproj" -> (() => {
        val withHash = all.foldLeft(projected) { (d, c) =>
          d.withColumn(s"__h_$c", graft.functions.Md5Top60.md5Top60(col(c).cast("string")))
        }
        withHash.agg(
          count(lit(1)).as("__n"),
          all.flatMap(c => battery(c, strings.contains(c), None) :+
            kmv(col(s"__h_$c"), c)): _*)
      })
    )

    variants.foreach { case (label, mk) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); once() // warm
      val runs = (1 to 5).map(_ => once()).sorted
      println(f"""{"metric":"profile_cost","variant":"$label","t_median":${runs(2)}%.3f,"t_min":${runs.head}%.3f}""")
    }
    spark.stop()
  }
}
