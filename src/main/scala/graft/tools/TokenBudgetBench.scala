package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale + skew measurement for [[graft.ops.Mixture.tokenBudgetPerSource]]'s
  * two plans: the one-window-per-source form (every doc of a source in
  * ONE task) vs the two-pass per-(source, bucket) prefix-sum form. The
  * interesting axis is SKEW — a pretraining corpus routinely has one
  * dominant source (a web crawl at 80–90 %+), which collapses the
  * windowed form to a single-task sort. `skewPct > 0` rewrites that
  * share of docs to one `web` source to reproduce the shape.
  *
  * `runMain graft.tools.TokenBudgetBench <sfDir> <skewPct>` — prints
  * doc count, max source share, and warm median-of-3 wall times for
  * both plans (noop sink), plus a one-off parity count (the spec pins
  * exact parity at sf0.001; here it guards the measurement itself).
  */
object TokenBudgetBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TokenBudgetBench <sfDir> <skewPct>")
    val sfDir = args(0)
    val skewPct = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs =
      if (skewPct <= 0) base
      else base.withColumn(
        "source",
        when(pmod(col("doc_id"), lit(100)) < skewPct, lit("web"))
          .otherwise(col("source")))
    val n = docs.count()
    // budget scaled so the kept set stays a real prefix at any corpus size
    val budget = math.max(600L, n / 10)

    def run(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def windowed() = graft.ops.Mixture.tokenBudgetWindowed(docs, budget, "tb1")
    def twoPass() = graft.ops.Mixture.tokenBudgetTwoPass(docs, budget, "tb1")

    run(windowed()); run(twoPass()) // warm-up
    val tw = Seq.fill(3)(run(windowed())).sorted
    val tt = Seq.fill(3)(run(twoPass())).sorted
    val parity = windowed().union(twoPass())
      .groupBy("doc_id", "source", "n_tokens").count()
      .where(col("count") =!= 2).count()
    val maxShare = docs.groupBy("source").count().agg(max("count")).first().getLong(0)
    println(s"""{"op":"token_budget","sf":"$sfDir","n":$n,"skew_pct":$skewPct,""" +
      s""""max_source_rows":$maxShare,"budget":$budget,""" +
      s""""windowed_sec":${tw(1)},"two_pass_sec":${tt(1)},"parity_mismatches":$parity}""")
    spark.stop()
  }
}
