package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-style cheap
  * model every production curation pipeline runs in front of (or in
  * place of) expensive quality judges: token unigrams hashed into
  * `numBuckets` frequency features, logistic regression on top,
  * trained by distilling a TEACHER predicate (here: the heuristic
  * quality gate) over a bounded sample.
  *
  * Why this shape at 100 TB: scoring is ONE generate + ONE per-doc
  * aggregate (map-side combinable) over codegen'd built-ins — no UDF,
  * no join (the weight table is constant-folded into an
  * `element_at(array(...))` lookup), no shuffle beyond the per-doc
  * combine. Training cost is bounded by `sampleSize` regardless of
  * corpus size, and the sample is content-hash-selected with the same
  * order-invariant recipe as [[Ivf.trainCentroids]] — same corpus ⇒
  * same model, on any partitioning, parallelism, or retry.
  *
  * Everything is engine-portable: the bucket hash is the md5 recipe of
  * [[Mixture.uniformHash]] (reproducible in DuckDB), and the trained
  * weights constant-fold into the generated SQL oracle
  * ([[scoreSql]]) — the q_align/PQ-family recipe, so even the LEARNED
  * model sits inside the hard correctness signal.
  */
object QualityClassifier {

  /** Trained model: `weights(b)` per hash bucket, plus intercept. The
    * score of a doc is sigmoid(intercept + Σ_tokens w(bucket(tok)) / n)
    * — i.e. weights dot NORMALIZED bucket frequencies. */
  case class Model(
      weights: Array[Double],
      intercept: Double,
      numBuckets: Int,
      salt: String
  )

  /** Token → feature bucket: first 8 md5 hex chars of `salt:token` as a
    * 32-bit int, mod `numBuckets`. DuckDB:
    * `('0x' || substr(md5('salt:' || tok), 1, 8))::BIGINT % numBuckets`. */
  def bucket(tok: Column, numBuckets: Int, salt: String): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$salt:"), tok).cast("binary")), 1, 8), 16, 10)
        .cast("long"),
      lit(numBuckets.toLong))

  /** Driver-side twin of [[bucket]] — used only at training time, on
    * the collected sample. */
  private def bucketOf(tok: String, numBuckets: Int, salt: String): Int = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"$salt:$tok".getBytes("UTF-8"))
    val hex = digest.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % numBuckets).toInt
  }

  /** Distill `teacher` (any boolean Column over the doc row — e.g. the
    * curation gate) into a hashed linear model. Deterministic: the
    * sample is content-hash-spread and hash-sorted (the
    * [[Ivf.trainCentroids]] recipe), init is zeros, and full-batch
    * gradient descent runs a fixed `iters` sweeps.
    *
    * The GD inner loops are SPARSE: each doc's feature vector has only
    * ~distinct-token-count nonzeros out of `numBuckets`, so the dot
    * product and gradient update walk the doc's own (bucket, value)
    * pairs in ascending-bucket order instead of sweeping all buckets.
    * This is BIT-IDENTICAL to the dense sweep it replaces (kept as
    * [[trainDense]] and pinned by QualityClassifierSpec): the skipped
    * terms are exact `w(j) * 0.0 = ±0.0` additions, and IEEE-754
    * round-to-nearest makes `acc + ±0.0` an identity for every value
    * the accumulators can reach (they start at +0.0 or the nonzero
    * intercept and a nonzero-term sum never rounds to -0.0), while the
    * per-bucket accumulation order across docs is unchanged. Cost drops
    * from O(iters · m · numBuckets) — ~2×10¹⁰ double ops at the
    * defaults, a 25 s single-core driver stall — to
    * O(iters · Σ distinct tokens), ~100× less. */
  def train(
      documents: DataFrame,
      teacher: Column,
      numBuckets: Int = 4096,
      salt: String = "qc0",
      sampleSize: Int = 2000,
      iters: Int = 1500,
      lr: Double = 2.0
  ): Model = {
    val sample = collectSample(documents, teacher, sampleSize)
    // sparse normalized bucket-frequency features per sampled doc,
    // scaled up internally so the ~0.05-wide decision margin produces
    // usable gradients (the scale folds back into the returned weights
    // below, so scoring still consumes raw frequencies). Bucket counts
    // accumulate in +1.0 steps and scale by the same single
    // `featScale / toks.length` factor as the dense path — exact.
    val featScale = 32.0
    val feats = sample.map { case (toks, y) =>
      val cnt = scala.collection.mutable.HashMap.empty[Int, Double]
      toks.foreach { t =>
        val bk = bucketOf(t, numBuckets, salt)
        cnt.update(bk, cnt.getOrElse(bk, 0.0) + 1.0)
      }
      val idx = cnt.keysIterator.toArray
      java.util.Arrays.sort(idx) // ascending = the dense sweep order
      val v = new Array[Double](idx.length)
      var j = 0
      while (j < idx.length) { v(j) = cnt(idx(j)) * (featScale / toks.length); j += 1 }
      (idx, v, y.toDouble)
    }
    val m = feats.length
    val w = new Array[Double](numBuckets)
    var b = 0.0
    (0 until iters).foreach { _ =>
      val gw = new Array[Double](numBuckets)
      var gb = 0.0
      feats.foreach { case (idx, x, y) =>
        var z = b; var j = 0
        while (j < idx.length) { z += w(idx(j)) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val e = p - y
        j = 0
        while (j < idx.length) { gw(idx(j)) += e * x(j); j += 1 }
        gb += e
      }
      // the weight update stays a dense sweep (numBuckets · iters ops,
      // negligible) so untouched buckets keep the exact dense history
      var j = 0
      while (j < numBuckets) { w(j) -= lr * gw(j) / m; j += 1 }
      b -= lr * gb / m
    }
    var j = 0
    while (j < numBuckets) { w(j) *= featScale; j += 1 }
    Model(w, b, numBuckets, salt)
  }

  /** The original dense-sweep trainer, retained ONLY as the equality
    * witness for [[train]]'s sparsification (QualityClassifierSpec
    * asserts bit-identical models). Do not call from production paths. */
  private[graft] def trainDense(
      documents: DataFrame,
      teacher: Column,
      numBuckets: Int = 4096,
      salt: String = "qc0",
      sampleSize: Int = 2000,
      iters: Int = 1500,
      lr: Double = 2.0
  ): Model = {
    val sample = collectSample(documents, teacher, sampleSize)
    val featScale = 32.0
    val feats = sample.map { case (toks, y) =>
      val x = new Array[Double](numBuckets)
      toks.foreach(t => x(bucketOf(t, numBuckets, salt)) += 1.0)
      var j = 0
      while (j < numBuckets) { x(j) *= featScale / toks.length; j += 1 }
      (x, y.toDouble)
    }
    val m = feats.length
    val w = new Array[Double](numBuckets)
    var b = 0.0
    (0 until iters).foreach { _ =>
      val gw = new Array[Double](numBuckets)
      var gb = 0.0
      feats.foreach { case (x, y) =>
        var z = b; var j = 0
        while (j < numBuckets) { z += w(j) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val e = p - y
        j = 0
        while (j < numBuckets) { gw(j) += e * x(j); j += 1 }
        gb += e
      }
      var j = 0
      while (j < numBuckets) { w(j) -= lr * gw(j) / m; j += 1 }
      b -= lr * gb / m
    }
    var j = 0
    while (j < numBuckets) { w(j) *= featScale; j += 1 }
    Model(w, b, numBuckets, salt)
  }

  /** The shared deterministic training sample: content-hash-spread,
    * hash-sorted, bounded by `sampleSize` (the [[Ivf.trainCentroids]]
    * recipe). */
  private def collectSample(
      documents: DataFrame,
      teacher: Column,
      sampleSize: Int
  ): Array[(Array[String], Int)] = {
    val rows = documents.select(
      col("text"),
      teacher.cast("int").as("__y"),
      xxhash64(col("text")).as("__h1"),
      xxhash64(lit(1), col("text")).as("__h2"))
    val total = rows.count()
    val stride = math.max(1L, total / math.max(1, sampleSize))
    val sample = rows
      .where(pmod(col("__h1"), lit(stride)) === 0)
      .orderBy(col("__h1"), col("__h2"))
      .limit(sampleSize)
      .collect()
      .map(r => (r.getString(0).split(" ", -1), r.getInt(1)))
    require(sample.nonEmpty, "empty training sample")
    sample
  }

  /** The model's nonzero weights, keyed by bucket. EXACT sparsification:
    * a bucket no training token ever hit keeps weight 0.0 through every
    * GD sweep (its feature is identically zero), so dropping zeros
    * changes nothing — and it keeps the constant-folded lookup at
    * O(distinct trained tokens) instead of O(numBuckets). Bounded by
    * the training sample, NOT the corpus; a model whose nonzero set
    * outgrew literal scale (>~10k entries) would move to a broadcast
    * per the ShingleSetOverlap lesson. */
  private def nonzero(model: Model): Seq[(Long, Double)] =
    model.weights.zipWithIndex.collect {
      case (w, i) if w != 0.0 => (i.toLong, w)
    }.toSeq

  /** Distributed scoring: explode tokens, look each token's weight up
    * in the constant-folded sparse weight map (absent bucket = 0.0),
    * one per-doc combine — no join, no UDF, one shuffle. Output
    * (doc_id, score, keep) with score = sigmoid(intercept + Σw/n)
    * rounded to 6dp and keep = (rounded score ≥ 0.5), the decision the
    * oracle reproduces. */
  def score(documents: DataFrame, model: Model): DataFrame = {
    val wmap = typedLit(nonzero(model).toMap)
    val wOfTok = coalesce(element_at(wmap, col("__b")), lit(0.0))
    val z =
      col("__sw") / col("__n") + lit(model.intercept)
    documents
      .select(
        col("doc_id"),
        // one-byte-pass bucket kernel; [[bucket]] is the spec/oracle twin
        // (GramBucketsSpec pins equality)
        explode(graft.functions.GramBuckets
          .gramBuckets(col("text"), model.numBuckets, model.salt, gramSize = 1))
          .as("__b"))
      .groupBy("doc_id")
      .agg(sum(wOfTok).as("__sw"), count(lit(1)).as("__n"))
      .select(
        col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
  }

  /** DuckDB SQL reproducing [[score]] bit-for-bit, GENERATED from the
    * trained model (nonzero weights as a VALUES table — the PQ-oracle
    * recipe — LEFT-joined so absent buckets contribute 0.0 exactly
    * like the engine's map miss). */
  def scoreSql(model: Model): String = {
    val vals = nonzero(model)
      .map { case (b, w) => s"($b,CAST($w AS DOUBLE))" }
      .mkString(",")
    s"""WITH w(b, wt) AS MATERIALIZED (VALUES $vals),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |tb AS (SELECT doc_id, ('0x' || substr(md5('${model.salt}:' || t), 1, 8))::BIGINT % ${model.numBuckets} AS b FROM tok),
       |s AS (SELECT doc_id, SUM(COALESCE(wt, 0.0)) AS sw, COUNT(*) AS n FROM tb LEFT JOIN w USING (b) GROUP BY doc_id),
       |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(sw / n + CAST(${model.intercept} AS DOUBLE)))), 6) AS score FROM s)
       |SELECT doc_id, score, CAST(score >= 0.5 AS INT) AS keep FROM sc""".stripMargin
  }
}
