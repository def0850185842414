package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupDocs, IncrementalDedup}

/** Precision/recall + cost A/B of incremental screening: collision-only
  * [[IncrementalDedup.screen]] vs signature-verified
  * [[IncrementalDedup.screenVerified]], on the boilerplate-injected
  * corpus ([[BoilerplateGen.inject]] — shared 12-token templates put
  * identical n-grams in many otherwise-unrelated docs, the web-corpus
  * shape where a lone band collision is exactly the noisy verdict
  * verification exists to reject).
  *
  * `runMain graft.tools.ScreenBench [sfDir] [fraction] [minJaccard]`
  *
  * Ground truth is EXACT per-pair 3-shingle Jaccard (inverted-index
  * join, no LSH anywhere in the truth path): a batch doc is a true dup
  * iff some corpus doc reaches `minJaccard`. Both screens are scored on
  * the `dup_of_corpus` axis against that truth, and timed warm
  * (median-of-3 collects against a materialized index). Expected shape:
  * equal-or-better precision for verified at the same candidate recall
  * bound — verification can only REMOVE collision flags, and the flags
  * it removes are the sub-threshold ones; whatever recall verification
  * loses comes from 16-hash estimate noise around the threshold, which
  * the printout makes visible rather than hides.
  */
object ScreenBench {
  private val K = 3
  private val NH = 16
  private val RPB = 4

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val fraction = if (args.length > 1) args(1).toDouble else 0.3
    val minJ = if (args.length > 2) args(2).toDouble else 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = BoilerplateGen
      .inject(graft.model.Tables.documents(spark, sfDir), fraction, nTemplates = 8)
      .select("doc_id", "text")
      .persist()
    val corpus = docs.where(col("doc_id") % 4 =!= 0)
    val batch = docs.where(col("doc_id") % 4 === 0)
    println(s"corpus=${corpus.count()} batch=${batch.count()} fraction=$fraction minJ=$minJ")

    // ---- exact ground truth: max exact Jaccard vs ANY corpus doc ----
    val shB = DedupDocs.shingles(batch, K).persist()
    val shC = DedupDocs.shingles(corpus, K).persist()
    val nB = shB.groupBy("doc_id").count().withColumnRenamed("count", "nb")
    val nC = shC.groupBy("doc_id").count().withColumnRenamed("count", "nc")
    val truth = shB
      .withColumnRenamed("doc_id", "bid")
      .join(shC.withColumnRenamed("doc_id", "cid"), "shingle")
      .groupBy("bid", "cid").agg(count(lit(1)).as("inter"))
      .join(nB.withColumnRenamed("doc_id", "bid"), "bid")
      .join(nC.withColumnRenamed("doc_id", "cid"), "cid")
      .where(col("inter") / (col("nb") + col("nc") - col("inter")) >= minJ)
      .select(col("bid").as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    println(s"truth: ${truth.size} batch docs have an exact-Jaccard>=$minJ corpus partner")
    shB.unpersist(); shC.unpersist()

    // ---- the two screens against materialized indexes ----
    val idxPlain = IncrementalDedup.buildIndex(corpus, K, NH, RPB).persist()
    val idxSig = IncrementalDedup.buildIndexWithSignatures(corpus, K, NH, RPB).persist()
    println(s"index rows: plain=${idxPlain.count()} sig=${idxSig.count()}")

    def score(name: String, out: => DataFrame): Unit = {
      var flagged: Set[Long] = Set.empty
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        flagged = out.where(col("dup_of_corpus") === 1)
          .collect().map(_.getLong(0)).toSet
        (System.nanoTime() - t0) / 1e9
      }
      val tp = (flagged & truth).size
      val fp = (flagged -- truth).size
      val fn = (truth -- flagged).size
      val p = if (flagged.isEmpty) 1.0 else tp.toDouble / flagged.size
      val r = if (truth.isEmpty) 1.0 else tp.toDouble / truth.size
      println(f"$name%-22s flagged=${flagged.size}%5d tp=$tp%5d fp=$fp%5d fn=$fn%5d " +
        f"precision=$p%.3f recall=$r%.3f median=${times.sorted.apply(1)}%.3fs")
    }

    score("collision-only",
      IncrementalDedup.screen(batch, idxPlain, K, NH, RPB))
    score(s"verified@$minJ",
      IncrementalDedup.screenVerified(batch, idxSig, K, NH, RPB, minJ))
    spark.stop()
  }
}
