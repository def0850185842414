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
    * itself, but the contract for new data). `gramSize` records which
    * gram stream the weights were estimated on, so scoring can't be
    * mismatched against them. */
  case class Weights(
      delta: Map[Long, Double],
      deltaDefault: Double,
      numBuckets: Int,
      salt: String,
      gramSize: Int = 1
  )

  /** The hashed gram stream per document: unigrams (`gramSize = 1`, the
    * cheap default) or unigrams + adjacent bigrams (`gramSize = 2`,
    * Xie et al. §2.1's actual estimator — bigrams catch the word-order
    * signal unigram bags lose). Bigram count is exactly max(0,
    * n_tokens − 1), so the stream stays linear in doc length.
    *
    * This expression-tree form is the SPEC/ORACLE twin (what the DuckDB
    * SQL spells); the execution path goes through the
    * [[graft.functions.GramBuckets]] kernel, which emits the same gram
    * stream's BUCKET ids directly in one byte pass (GramBucketsSpec
    * pins element-for-element equality). */
  private[graft] def grams(gramSize: Int): Column = {
    val toks = split(col("text"), " ")
    gramSize match {
      case 1 => toks
      case 2 =>
        concat(
          toks,
          when(
            size(toks) >= 2,
            transform(
              sequence(lit(0), size(toks) - 2),
              i => concat_ws(" ", slice(toks, i + 1, lit(2))))
          ).otherwise(array().cast("array<string>")))
      case other =>
        throw new IllegalArgumentException(s"gramSize must be 1 or 2, got $other")
    }
  }

  /** Estimate bucketed target/background gram distributions in one
    * aggregate. `isTarget` is any boolean Column over the doc row (e.g.
    * `col("lang") === "en"` or a benchmark-membership flag). */
  def train(
      documents: DataFrame,
      isTarget: Column,
      numBuckets: Int = 1024,
      salt: String = "dsir0",
      gramSize: Int = 1
  ): Weights = {
    // a NULL teacher verdict counts as background (false) — without the
    // coalesce, a bucket hit only by NULL-verdict rows would aggregate
    // (NULL, NULL) and crash the collect, and mixed buckets would
    // silently drop those rows from both distributions
    val counts = documents
      .select(
        coalesce(isTarget, lit(false)).cast("long").as("__t"),
        explode(graft.functions.GramBuckets
          .gramBuckets(col("text"), numBuckets, salt, gramSize)).as("b"))
      .groupBy(col("b"))
      .agg(sum(col("__t")).as("ct"), sum(lit(1L) - col("__t")).as("cb"))
      .collect() // ≤ numBuckets rows by construction
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nT = counts.map(_._2).sum.toDouble
    val nB = counts.map(_._3).sum.toDouble
    val b = numBuckets.toDouble
    val delta = counts.map { case (bk, ct, cb) =>
      bk -> (math.log((ct + 1.0) / (nT + b)) - math.log((cb + 1.0) / (nB + b)))
    }.toMap
    Weights(delta, math.log(nB + b) - math.log(nT + b), numBuckets, salt, gramSize)
  }

  /** Per-document importance score: mean per-token delta-log, rounded to
    * 6dp (the oracle-compared-double contract — the per-doc SUM is
    * order-free on both engines, so the round absorbs association
    * differences). Output (doc_id, score) for every document. */
  def score(documents: DataFrame, w: Weights): DataFrame = {
    val dmap = typedLit(w.delta)
    val deltaOfTok = coalesce(element_at(dmap, col("__b")), lit(w.deltaDefault))
    documents
      .select(
        col("doc_id"),
        explode(graft.functions.GramBuckets
          .gramBuckets(col("text"), w.numBuckets, w.salt, w.gramSize)).as("__b"))
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
    // an empty/degenerate corpus would otherwise emit `VALUES ` — a
    // DuckDB syntax error at verify time instead of a clear failure here
    require(w.delta.nonEmpty, "empty weight table: train() saw no tokens")
    val vals = w.delta.toSeq.sorted
      .map { case (b, d) => s"($b,CAST($d AS DOUBLE))" }
      .mkString(",")
    // the gram stream mirrors [[grams]]: unigrams, or unigrams UNION ALL
    // adjacent bigrams (slice t[i+1 : i+2] joined with a space — exactly
    // the engine's concat_ws over slice)
    val tokCte = w.gramSize match {
      case 1 =>
        "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)"
      case 2 =>
        """toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |tok AS (SELECT doc_id, unnest(ts) AS t FROM toks
          |        UNION ALL
          |        SELECT doc_id, array_to_string(ts[i + 1 : i + 2], ' ') AS t
          |        FROM toks, unnest(generate_series(0, len(ts) - 2)) AS u(i))""".stripMargin
      case other => // Weights is a public case class — train() isn't the only door
        throw new IllegalArgumentException(s"gramSize must be 1 or 2, got $other")
    }
    s"""WITH w(b, wt) AS MATERIALIZED (VALUES $vals),
       |$tokCte,
       |tb AS (SELECT doc_id, ('0x' || substr(md5('${w.salt}:' || t), 1, 8))::BIGINT % ${w.numBuckets} AS b FROM tok),
       |s AS (SELECT doc_id, SUM(COALESCE(wt, CAST(${w.deltaDefault} AS DOUBLE))) AS sw, COUNT(*) AS n
       |      FROM tb LEFT JOIN w USING (b) GROUP BY doc_id)
       |SELECT doc_id, round(sw / n, 6) AS score FROM s
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
