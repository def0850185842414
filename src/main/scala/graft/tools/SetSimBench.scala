package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[graft.ops.SetSim]] scale-shape measurement —
  * `runMain graft.tools.SetSimBench [nDocs] [classSize]`.
  *
  * The q_setsim_join ORACLE fixture holds class COUNT fixed (97), so
  * scaling the corpus grows each class linearly and the qualifying
  * OUTPUT quadratically — a fixture artifact (the q_semdedup
  * fixed-parameter shape), not an operator property. This bench holds
  * class SIZE fixed (matches per record constant, output linear in
  * corpus) and scales class count with the corpus — the contract a
  * real near-dup workload follows — and reports wall time at 1× and
  * 100×, plus an adversarial all-identical corpus where every prefix
  * bucket is over-cap: time must stay bounded (saturating shed), with
  * prefixShed reporting the drop.
  */
object SetSimBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 500000
    val classSize = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int): DataFrame = {
      val nClasses = math.max(1, n / classSize)
      val c = col("id") % nClasses
      val toks = transform(
        sequence(lit(0L), lit(11L)),
        j => concat(lit("s"),
          when(j === col("id") % 12, c * 100 + 50 + j)
            .otherwise(c * 100 + j).cast("string")))
      spark.range(n).select(col("id"), toks.as("toks"))
    }

    def timeMin3(df: => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val small = corpus(nDocs / 100)
    val big = corpus(nDocs)
    val t1 = timeMin3(graft.ops.SetSim.jaccardSelfJoin(small, "id", "toks", 0.7))
    val n1 = graft.ops.SetSim.jaccardSelfJoin(small, "id", "toks", 0.7).count()
    val t100 = timeMin3(graft.ops.SetSim.jaccardSelfJoin(big, "id", "toks", 0.7))
    val n100 = graft.ops.SetSim.jaccardSelfJoin(big, "id", "toks", 0.7).count()

    // adversarial: every record identical — output is genuinely
    // quadratic, the cap must shed instead of exploding one task
    val ident = spark.range(nDocs).select(col("id"),
      array((0 until 12).map(j => lit(s"x$j")): _*).as("toks"))
    val tAdv = timeMin3(graft.ops.SetSim.jaccardSelfJoin(ident, "id", "toks", 0.7))
    val nAdv = graft.ops.SetSim.jaccardSelfJoin(ident, "id", "toks", 0.7).count()
    val shed = graft.ops.SetSim.prefixShed(ident, "id", "toks", 0.7).count()

    println(s"""{"bench":"setsim","nDocs":$nDocs,"classSize":$classSize,""" +
      s""""t_1x_sec":$t1,"pairs_1x":$n1,"t_100x_sec":$t100,"pairs_100x":$n100,""" +
      s""""t_adversarial_sec":$tAdv,"pairs_adversarial":$nAdv,"shed_buckets":$shed}""")
    spark.stop()
  }
}
