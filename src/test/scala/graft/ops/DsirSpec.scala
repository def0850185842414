package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bigram scoring matches a driver-side recompute of the gram stream") {
    val docs = Tables.documents(spark, dir)
    val w = Dsir.train(docs, col("lang") === "en",
      numBuckets = 256, salt = "ds-t", gramSize = 2)
    assert(w.gramSize == 2)
    val got = Dsir.score(docs, w).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucketOf(g: String): Long = {
      val digest = java.security.MessageDigest
        .getInstance("MD5").digest(s"${w.salt}:$g".getBytes("UTF-8"))
      val hex = digest.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % w.numBuckets
    }
    docs.select("doc_id", "text").collect().foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val grams = toks.toSeq ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val sw = grams.map(g => w.delta.getOrElse(bucketOf(g), w.deltaDefault)).sum
      val score = BigDecimal(sw / grams.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(r.getLong(0)) - score) < 1e-9,
        s"doc ${r.getLong(0)}: ${got(r.getLong(0))} vs $score")
    }
  }

  test("unigram and bigram estimators rank differently but deterministically") {
    val docs = Tables.documents(spark, dir)
    val w1 = Dsir.train(docs, col("lang") === "en", numBuckets = 256, salt = "ds-t")
    val w2 = Dsir.train(docs, col("lang") === "en",
      numBuckets = 256, salt = "ds-t", gramSize = 2)
    val a = Dsir.resample(docs, w2, k = 20).collect().map(_.getLong(0)).toSeq
    val b = Dsir.resample(
      docs.orderBy(col("doc_id").desc).repartition(5), w2, k = 20)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "bigram resample must be partitioning/order-invariant")
    assert(w1.delta != w2.delta, "bigram stream must change the estimated weights")
  }

  test("NULL teacher verdicts count as background instead of crashing training") {
    import spark.implicits._
    val df = Seq(
      (0L, "aa bb cc", Some("en")),
      (1L, "dd ee ff", None), // NULL lang → NULL teacher verdict
      (2L, "aa dd gg", Some("de"))
    ).toDF("doc_id", "text", "lang")
    val w = Dsir.train(df, col("lang") === "en", numBuckets = 64, salt = "nt")
    // doc 1's tokens must be in the background distribution: its
    // exclusive tokens get a negative delta like doc 2's
    val wNoNull = Dsir.train(
      df.withColumn("lang", coalesce(col("lang"), lit("xx"))),
      col("lang") === "en", numBuckets = 64, salt = "nt")
    assert(w.delta == wNoNull.delta && w.deltaDefault == wNoNull.deltaDefault)
  }

  test("scoreSql rejects an empty weight table instead of emitting bad SQL") {
    val w = Dsir.Weights(Map.empty, 0.0, 16, "s")
    intercept[IllegalArgumentException](Dsir.scoreSql(w, 5))
  }

  test("train rejects gramSize outside {1, 2}") {
    val docs = Tables.documents(spark, dir)
    intercept[IllegalArgumentException](
      Dsir.train(docs, col("lang") === "en", gramSize = 3).delta)
  }
}
