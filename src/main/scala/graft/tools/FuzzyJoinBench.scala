package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[graft.ops.FuzzyJoin]] dictionary-scale measurement —
  * `runMain graft.tools.FuzzyJoinBench [nBase] [typoFrac]`.
  *
  * Generates nBase distinct md5-hex domain strings plus planted typos
  * (one DELETION typo per base for a typoFrac fraction, one
  * SUBSTITUTION typo for another typoFrac), runs editDistancePairs
  * (d = 1) and linkToDictionary over the union, and reports wall time
  * (median of 3) plus planted-pair recall — which must be 1.0: the
  * deletion-neighborhood filter is complete, the operator is EXACT.
  * Brute force at this scale would be nBase² levenshtein calls; the
  * point of the bench is that the indexed form never materializes
  * them (pair counts and wall times are the evidence).
  */
object FuzzyJoinBench {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 100000
    val typoFrac = if (args.length > 1) args(1).toDouble else 0.1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16-hex-char base names: at 100k–1M strings, accidental dist-1
    // pairs between independent names are vanishingly rare, so the
    // planted pairs ARE the expected answer (checked below).
    val base = spark.range(nBase).select(
      concat(substring(md5(col("id").cast("string").cast("binary")), 1, 16), lit(".com"))
        .as("domain"))
    val nTypo = (nBase * typoFrac).toInt
    val h = md5(col("id").cast("string").cast("binary"))
    val delTypo = spark.range(nTypo).select(
      concat(substring(h, 1, 7), substring(h, 9, 8), lit(".com")).as("domain"))
    val subTypo = spark.range(nTypo, 2 * nTypo).select(
      concat(substring(h, 1, 7), lit("_"), substring(h, 9, 8), lit(".com")).as("domain"))
    val all = base.unionAll(delTypo).unionAll(subTypo)

    def timeMedian(df: => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)

    val pairs = graft.ops.FuzzyJoin.editDistancePairs(all, "domain", maxDist = 1)
    val tPairs = timeMedian(pairs)
    val nPairs = pairs.count()

    // planted recall: every deletion typo of id < nTypo must pair with
    // its base; every substitution typo likewise
    val expected = 2L * nTypo
    val planted = pairs
      .where(col("dist") === 1)
      .count()

    val tLink = timeMedian(
      graft.ops.FuzzyJoin.linkToDictionary(
        delTypo.unionAll(subTypo), "domain", base, "domain", maxDist = 1))

    println(
      s"""{"bench":"fuzzy_join","n_base":$nBase,"n_typo":${2 * nTypo},""" +
        s""""pairs_s":$tPairs,"n_pairs":$nPairs,"dist1_pairs":$planted,""" +
        s""""expected_planted":$expected,"link_s":$tLink}""")

    // Adversarial short-key corpus: every string of length ≤ 3 over a
    // 36-char alphabet (~48k distinct keys concentrating into ~1.3k
    // dense length-2 variant buckets of ~100+ members each). Uncapped
    // this is a tens-of-millions pair explode skewed onto few tasks;
    // the capped form sheds the dense buckets (variantShed counts
    // them) and stays bounded.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val n = alpha.length
    val shortKeys = spark.range(n.toLong * n * n).select(
      concat(
        element_at(lit(alpha.map(_.toString).toArray), (col("id") / (n * n)).cast("int") + 1),
        element_at(lit(alpha.map(_.toString).toArray), ((col("id") / n) % n).cast("int") + 1),
        element_at(lit(alpha.map(_.toString).toArray), (col("id") % n).cast("int") + 1)
      ).as("domain"))
    val tight = 64
    val tAdv = timeMedian(
      graft.ops.FuzzyJoin.editDistancePairs(shortKeys, "domain", maxDist = 1, maxBucket = tight))
    val shed = graft.ops.FuzzyJoin.variantShed(shortKeys, "domain", 1, tight)
    val shedRows = shed.count()
    val shedMembers = shed.agg(sum("n_members")).collect()(0).getLong(0)
    println(
      s"""{"bench":"fuzzy_join_adversarial","n_keys":${n.toLong * n * n},""" +
        s""""max_bucket":$tight,"capped_s":$tAdv,"shed_buckets":$shedRows,""" +
        s""""shed_members":$shedMembers}""")
    spark.stop()
  }
}
