package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def teacher = {
    val nTok = size(split(col("text"), " ")).cast("double")
    val nStop = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(Seq("the", "a")))
      .getItem(0)
      .cast("double")
    nStop / nTok >= 0.05
  }

  test("training is deterministic and invariant to partitioning/order") {
    val docs = Tables.documents(spark, dir)
    val a = QualityClassifier.train(docs, teacher, sampleSize = 200, iters = 50)
    val b = QualityClassifier.train(
      docs.orderBy(col("doc_id").desc).repartition(7), teacher, sampleSize = 200, iters = 50)
    assert(a.intercept == b.intercept)
    assert(a.weights.sameElements(b.weights))
  }

  test("sparse training is BIT-identical to the dense sweep it replaced") {
    val docs = Tables.documents(spark, dir)
    // full default hyperparameters except iters (kept test-sized; the
    // identity argument is per-operation, so it holds for any iters)
    val sparse = QualityClassifier.train(docs, teacher, sampleSize = 200, iters = 120)
    val dense = QualityClassifier.trainDense(docs, teacher, sampleSize = 200, iters = 120)
    assert(java.lang.Double.doubleToLongBits(sparse.intercept) ==
      java.lang.Double.doubleToLongBits(dense.intercept))
    assert(sparse.weights.length == dense.weights.length)
    sparse.weights.indices.foreach { j =>
      assert(java.lang.Double.doubleToLongBits(sparse.weights(j)) ==
        java.lang.Double.doubleToLongBits(dense.weights(j)),
        s"bucket $j: ${sparse.weights(j)} vs ${dense.weights(j)}")
    }
  }

  test("the distilled model actually learns the teacher (accuracy >> base rate)") {
    val docs = Tables.documents(spark, dir)
    val model = QualityClassifier.train(docs, teacher)
    val joined = QualityClassifier
      .score(docs, model)
      .join(docs.select(col("doc_id"), teacher.cast("int").as("y")), "doc_id")
      .select(col("keep"), col("y"))
      .collect()
    val acc = joined.count(r => r.getInt(0) == r.getInt(1)).toDouble / joined.length
    val baseRate = {
      val ys = joined.map(_.getInt(1))
      math.max(ys.sum, ys.length - ys.sum).toDouble / ys.length
    }
    assert(acc >= 0.9, s"accuracy $acc")
    assert(acc > baseRate, s"accuracy $acc vs base rate $baseRate")
  }

  test("distributed scoring matches a driver-side recompute of the model") {
    val docs = Tables.documents(spark, dir)
    val model = QualityClassifier.train(docs, teacher, sampleSize = 200, iters = 50)
    val got = QualityClassifier.score(docs, model)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    def bucketOf(tok: String): Int = {
      val digest = java.security.MessageDigest
        .getInstance("MD5").digest(s"${model.salt}:$tok".getBytes("UTF-8"))
      val hex = digest.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % model.numBuckets).toInt
    }
    docs.select("doc_id", "text").collect().foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val sw = toks.map(t => model.weights(bucketOf(t))).sum
      val z = sw / toks.length + model.intercept
      val score = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gs, gk) = got(r.getLong(0))
      assert(math.abs(gs - score) < 1e-9, s"doc ${r.getLong(0)}: $gs vs $score")
      assert(gk == (if (gs >= 0.5) 1 else 0))
    }
  }
}
