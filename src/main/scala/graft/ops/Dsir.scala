package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023, DSIR) —
  * the hashed-n-gram importance weighting every scaled pretraining
  * pipeline uses to up-select raw data that "looks like" a target
  * distribution: estimate bucketed token distributions for a TARGET
  * slice and the BACKGROUND corpus, then score every document by its
  * mean per-token log-likelihood ratio and keep the top scorers.
  *
  * Why this shape at 100 TB ([[QualityClassifier]]'s exact recipe, with
  * the trained weights replaced by closed-form count ratios):
  *  - estimation is ONE token-stream aggregate that map-side combines to
  *    ≤ `numBuckets` rows (the exchange carries buckets, not tokens) and
  *    collects driver-tiny regardless of corpus size;
  *  - scoring is one generate + a constant-folded `element_at` lookup +
  *    one per-doc combine — no join, no UDF, nothing but the per-doc
  *    aggregate shuffles;
  *  - selection is a rank — expressed as orderBy+limit so Catalyst plans
  *    TakeOrderedAndProject (per-partition top-k, no global sort).
  *
  * Everything is engine-portable: the bucket hash is the md5 recipe of
  * [[QualityClassifier.bucket]] (reproducible in DuckDB) and the count
  * ratios constant-fold into the generated SQL oracle ([[scoreSql]]) —
  * the q_align/PQ-family recipe, so the learned distributions sit inside
  * the hard correctness signal.
  */
object Dsir {

  /** Estimated importance weights: `delta(b)` = log p_target(b) − log
    * p_background(b) per hash bucket, add-1 smoothed. `deltaDefault` is
    * the smoothing-only value for buckets no training token hit — the
    * map-miss fallback (unreachable when scoring the training corpus
    * itself, but the contract for new data). */
  case class Weights(
      delta: Map[Long, Double],
      deltaDefault: Double,
      numBuckets: Int,
      salt: String
  )

  /** Estimate bucketed target/background token distributions in one
    * aggregate. `isTarget` is any boolean Column over the doc row (e.g.
    * `col("lang") === "en"` or a benchmark-membership flag). */
  def train(
      documents: DataFrame,
      isTarget: Column,
      numBuckets: Int = 1024,
      salt: String = "dsir0"
  ): Weights = {
    val counts = documents
      .select(isTarget.cast("long").as("__t"), explode(split(col("text"), " ")).as("__tok"))
      .groupBy(QualityClassifier.bucket(col("__tok"), numBuckets, salt).as("b"))
      .agg(sum(col("__t")).as("ct"), sum(lit(1L) - col("__t")).as("cb"))
      .collect() // ≤ numBuckets rows by construction
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nT = counts.map(_._2).sum.toDouble
    val nB = counts.map(_._3).sum.toDouble
    val b = numBuckets.toDouble
    val delta = counts.map { case (bk, ct, cb) =>
      bk -> (math.log((ct + 1.0) / (nT + b)) - math.log((cb + 1.0) / (nB + b)))
    }.toMap
    Weights(delta, math.log(nB + b) - math.log(nT + b), numBuckets, salt)
  }

  /** Per-document importance score: mean per-token delta-log, rounded to
    * 6dp (the oracle-compared-double contract — the per-doc SUM is
    * order-free on both engines, so the round absorbs association
    * differences). Output (doc_id, score) for every document. */
  def score(documents: DataFrame, w: Weights): DataFrame = {
    val dmap = typedLit(w.delta)
    val deltaOfTok = coalesce(
      element_at(dmap, QualityClassifier.bucket(col("__tok"), w.numBuckets, w.salt)),
      lit(w.deltaDefault))
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("__tok"))
      .groupBy("doc_id")
      .agg(sum(deltaOfTok).as("__s"), count(lit(1)).as("__n"))
      .select(col("doc_id"), round(col("__s") / col("__n"), 6).as("score"))
  }

  /** The resampled selection: top `k` docs by importance score,
    * deterministic doc_id tiebreak. orderBy+limit ⇒
    * TakeOrderedAndProject — per-partition heaps, no global sort. */
  def resample(documents: DataFrame, w: Weights, k: Int): DataFrame =
    score(documents, w).orderBy(col("score").desc, col("doc_id").asc).limit(k)

  /** DuckDB SQL reproducing [[resample]] bit-for-bit, GENERATED from the
    * estimated weights (nonzero-delta buckets as a VALUES table,
    * map-miss fallback as the same COALESCE default). */
  def scoreSql(w: Weights, k: Int): String = {
    val vals = w.delta.toSeq.sorted
      .map { case (b, d) => s"($b,CAST($d AS DOUBLE))" }
      .mkString(",")
    s"""WITH w(b, wt) AS MATERIALIZED (VALUES $vals),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |tb AS (SELECT doc_id, ('0x' || substr(md5('${w.salt}:' || t), 1, 8))::BIGINT % ${w.numBuckets} AS b FROM tok),
       |s AS (SELECT doc_id, SUM(COALESCE(wt, CAST(${w.deltaDefault} AS DOUBLE))) AS sw, COUNT(*) AS n
       |      FROM tb LEFT JOIN w USING (b) GROUP BY doc_id)
       |SELECT doc_id, round(sw / n, 6) AS score FROM s
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
