package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for a training-data pipeline: flag corpus
  * documents that share word k-shingles with a benchmark/eval set, so
  * eval content doesn't leak into training data.
  *
  * Physical plan (the 100 TB shape): the benchmark side is tiny relative
  * to the corpus (eval suites are ~1e4–1e6 docs), so its distinct-shingle
  * set is BROADCAST and the corpus stream is never shuffled for the
  * match: corpus shingles explode in place ([[DedupDocs.shingles]] —
  * ShingleArray dedupes per doc in-kernel), a broadcast-hash LEFT SEMI
  * join keeps matching shingles only, and ONE aggregation produces the
  * per-doc overlap counts. A document's shingles never span partitions
  * (explode doesn't split a row), so map-side partial aggregation
  * collapses each doc to a single row before the exchange — the shuffle
  * is O(docs with ≥1 match), and zero-overlap documents (the vast
  * majority at scale) never enter it at all.
  *
  * The `*Against` forms take corpus and benchmark as separate frames
  * (the deployment shape — eval suites live in their own table); the
  * `isBench`-predicate forms carve both out of one frame.
  */
object Decontaminate {

  /** Per-corpus-document count of DISTINCT word k-shingles shared with
    * the benchmark frame. Documents with zero overlap are omitted — at
    * scale that is almost everyone, and emitting them would turn the
    * O(matches) aggregate into an O(corpus) join.
    *
    * Two plans, auto-selected on the [[graft.spikes.Spikes
    * .fitsBroadcast]] byte model, IDENTICAL output (spec-pinned):
    *  - bench shingle set provably under the broadcast threshold →
    *    broadcast LEFT SEMI, the corpus never shuffles (the common
    *    case: eval suites are ~1e4–1e6 docs);
    *  - oversized bench set → the old degradation shuffled the ENTIRE
    *    corpus shingle stream (the 100 TB cliff). Now a BLOOM
    *    pre-filter runs first: one bench-side aggregate builds a bloom
    *    over the shingle xxhash64s (Spark's own BloomFilterAggregate —
    *    ~1.2 MB per million shingles at 1 % fpp), the constant-folded
    *    might_contain prunes the corpus stream IN the scan stage, and
    *    only survivors (true matches + ε false positives) enter the
    *    exact shuffled semi-join that makes the result exact. The
    *    shuffle is O(matches + ε·corpus-shingles) instead of
    *    O(corpus-shingles). Spark clamps the filter to its
    *    runtime-filter session caps (4M items / 64M bits by default) —
    *    past the point where the clamped filter still gives ~5
    *    bits/item the bloom would saturate toward fpp 1, so the path
    *    detects that and falls back to the plain shuffled semi-join
    *    (raise `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` to
    *    extend the bloom regime). */
  def overlapCountsAgainst(corpus: DataFrame, bench: DataFrame, k: Int): DataFrame = {
    // The bench shingle set is consumed 2-3 times (gate count, optional
    // bloom aggregate, the exact semi-join), so it persists: it is the
    // INDEX side — deployments build it once per eval suite and screen
    // many corpora against it. Spark's LRU (and Bench's between-query
    // clearCache) bounds the residency; at ~16 B/shingle in memory the
    // cache is small next to the corpus stream it saves re-exploding.
    val benchShingles = DedupDocs.shingles(bench, k).select("shingle").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // COUNT-GATED, not forced: the exact distinct-shingle count costs
    // one extra aggregate over the bench slice — by assumption the
    // small side, and when it isn't, the plan switch it buys is
    // exactly what's needed. (This count also materializes the cache.)
    val n = benchShingles.count()
    if (n == 0L || graft.spikes.Spikes.fitsBroadcast(benchShingles, n))
      overlapFrom(DedupDocs.shingles(corpus, k), broadcast(benchShingles))
    else
      overlapCountsBloom(corpus, benchShingles, n, k)
  }

  /** The Bloom-prefiltered large-benchmark plan (see
    * [[overlapCountsAgainst]]); `benchShingles` must be distinct.
    * Exactness: might_contain has no false NEGATIVES, so the exact
    * semi-join over the survivors returns precisely the rows the
    * direct semi-join would — the bloom only sheds non-matching rows
    * early. */
  private[graft] def overlapCountsBloom(
      corpus: DataFrame,
      benchShingles: DataFrame,
      benchCount: Long,
      k: Int,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    val conf = corpus.sparkSession.conf
    // Spark CLAMPS BloomFilterAggregate to the runtime-filter session
    // caps (maxNumItems default 4M, maxNumBits default 64M) regardless
    // of the requested size. A saturated bloom has no false NEGATIVES —
    // results stay exact — but its fpp climbs toward 1 and the
    // pre-filter sheds nothing while still paying a per-row probe; so
    // when the CLAMPED filter cannot give ~5 bits/item (fpp ≳ 0.1),
    // skip the bloom and go straight to the shuffled exact semi-join.
    val maxBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val wantBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(benchCount, fpp)
    val effBits = math.min(wantBits, maxBits)
    if (effBits / math.max(benchCount, 1L) < 5L)
      return overlapFrom(DedupDocs.shingles(corpus, k), benchShingles)
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("shingle"))),
        Literal(math.min(benchCount, maxItems)),
        Literal(effBits)
      ).toAggregateExpression())
    val bloom = benchShingles.agg(bloomAgg.as("bf")).collect()(0).getAs[Array[Byte]](0)
    require(bloom != null, "bloom aggregate returned null for a non-empty bench side")
    val mightContain = Bridge.column(
      BloomFilterMightContain(
        Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(xxhash64(col("shingle")))))
    overlapFrom(
      DedupDocs.shingles(corpus, k).where(mightContain),
      benchShingles)
  }

  /** Shared tail: exact semi-join + per-doc overlap count. Shingles are
    * distinct per doc already, so count(*) IS the distinct overlap
    * count. */
  private def overlapFrom(corpusShingles: DataFrame, benchShingles: DataFrame): DataFrame =
    corpusShingles
      .join(benchShingles, Seq("shingle"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))

  /** [[overlapCountsAgainst]] with corpus/benchmark carved out of one
    * frame by the `isBench` predicate. */
  def overlapCounts(documents: DataFrame, isBench: Column, k: Int): DataFrame =
    overlapCountsAgainst(documents.where(!isBench), documents.where(isBench), k)

  /** [[overlapCounts]] plus the contamination verdict at `minOverlap`
    * distinct shared shingles (int 0/1 for engine/oracle portability). */
  def overlapFlags(documents: DataFrame, isBench: Column, k: Int, minOverlap: Int): DataFrame =
    overlapCounts(documents, isBench, k)
      .withColumn("contaminated", (col("n_overlap") >= minOverlap).cast("int"))

  /** The decontaminated corpus: `corpus` minus documents with at least
    * `minOverlap` distinct shingles shared with `bench`. The flagged id
    * set is small by construction (contamination is the exception), so
    * the anti-join broadcasts and the corpus is filtered without a
    * shuffle. */
  def cleanAgainst(corpus: DataFrame, bench: DataFrame, k: Int, minOverlap: Int): DataFrame = {
    val flagged = overlapCountsAgainst(corpus, bench, k)
      .where(col("n_overlap") >= minOverlap)
      .select("doc_id")
    corpus.join(broadcast(flagged), Seq("doc_id"), "left_anti")
  }

  /** [[cleanAgainst]] with corpus/benchmark carved out of one frame. */
  def clean(documents: DataFrame, isBench: Column, k: Int, minOverlap: Int): DataFrame =
    cleanAgainst(documents.where(!isBench), documents.where(isBench), k, minOverlap)

  /** FUZZY decontamination: corpus documents that are NEAR-duplicates of
    * benchmark documents, via MinHash-LSH band collision — the companion
    * check production pipelines run beside the exact-shingle overlap
    * (a lightly paraphrased or truncated eval question shares few exact
    * k-shingles but still collides on signature bands).
    *
    * Physical plan (the [[IncrementalDedup.screen]] shape with the
    * benchmark as the index): both sides run the ONE-pass
    * [[DedupDocs.bandKeys]] signature pipeline (native MinHashSig
    * kernel); the bench side collapses to its DISTINCT (band, band_key)
    * set — ≤ benchDocs × numBands rows, count-gated broadcast — and the
    * corpus stream is matched with a broadcast LEFT SEMI + one per-doc
    * count. No pair set, no corpus shuffle beyond the per-doc combine;
    * zero-collision documents (the vast majority) never enter the
    * exchange. Output: (doc_id, n_hit_bands ∈ [1..numBands]) per
    * colliding corpus doc — thresholding on n_hit_bands trades recall
    * for precision exactly like the screen's verified variant.
    *
    * Oracle: the full band recipe is SQL-expressible (the
    * q_minhash_lsh/q_dedup_incremental family), so the fuzzy verdict
    * sits inside the hard correctness signal. */
  def fuzzyOverlapAgainst(
      corpus: DataFrame,
      bench: DataFrame,
      k: Int,
      numHashes: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val benchBands = DedupDocs
      .bandKeys(bench, k, numHashes, rowsPerBand)
      .select("band", "band_key")
      .distinct()
    val gated =
      graft.spikes.Spikes.broadcastIfSmall(benchBands, benchBands.count())
    DedupDocs
      .bandKeys(corpus, k, numHashes, rowsPerBand)
      .join(gated, Seq("band", "band_key"), "left_semi")
      // one row per (doc, band) by construction ⇒ count(*) is the
      // distinct colliding-band count
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_bands"))
  }

  /** [[fuzzyOverlapAgainst]] with corpus/benchmark carved out of one
    * frame by the `isBench` predicate. */
  def fuzzyOverlap(
      documents: DataFrame,
      isBench: Column,
      k: Int,
      numHashes: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame =
    fuzzyOverlapAgainst(
      documents.where(!isBench), documents.where(isBench), k, numHashes, rowsPerBand)

  /** [[fuzzyOverlapAgainst]] with SIGNATURE VERIFICATION — the
    * [[IncrementalDedup.screenVerified]] precision knob applied to
    * decontamination: a band collision is only a CANDIDATE; the doc is
    * flagged when some bench doc's estimated Jaccard (matching
    * signature components / numHashes) clears `minJaccard`. At
    * rowsPerBand = 4 a lone 4-hash collision is a noisy verdict, and a
    * decontamination verdict DROPS training data — precision is money.
    * ScreenBench measured the same verification at +0.07 precision,
    * zero recall cost, zero time cost on the screen.
    *
    * Same plan as [[fuzzyOverlapAgainst]] — the signatures ride the
    * band rows ([[DedupDocs.bandKeysWithSig]], ~128 B extra per row),
    * and the check is a per-candidate `zip_with`/`aggregate` projection
    * inside the same broadcast join: verification adds NO exchange.
    * Output: (doc_id, best_matches ∈ [⌈minJaccard·numHashes⌉ ..
    * numHashes]) per verified-contaminated corpus doc. Threshold
    * compares integer match counts, so the SQL oracle's SUM form
    * cannot float-diverge. */
  def fuzzyOverlapVerifiedAgainst(
      corpus: DataFrame,
      bench: DataFrame,
      k: Int,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5
  ): DataFrame = {
    val minMatches = math.ceil(minJaccard * numHashes).toInt
    val benchBands = DedupDocs
      .bandKeysWithSig(bench, k, numHashes, rowsPerBand)
      .select(col("band"), col("band_key"), col("sig").as("__bsig"))
      .distinct()
    // local byte gate: the generic broadcastIfSmall model allots 64 B
    // per variable-width field, which under-counts the numHashes-long
    // sig array ~2× (8 B offset/size + 8 B header + 8 B per hash) —
    // exactly the under-count class that defeats the OOM guard. Model
    // the row exactly: null word + band long + band-key string
    // (offset/size + ~8 B/hash of "s:hash," text) + the sig array.
    val thr = bench.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // null word + band long + band-key string (offset/size + ~16 B per
    // "seed:hash," component) + sig array (offset/size + header + 8 B/hash)
    val perRow = 8L + 8L + (8L + 16L * rowsPerBand) + (16L + 8L * numHashes)
    val nBands = benchBands.count()
    val gated =
      if (thr > 0 && nBands * perRow <= thr) broadcast(benchBands) else benchBands
    val matches = aggregate(
      zip_with(col("sig"), col("__bsig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v)
    DedupDocs
      .bandKeysWithSig(corpus, k, numHashes, rowsPerBand)
      .join(gated, Seq("band", "band_key"))
      .select(col("doc_id"), matches.as("__m"))
      .where(col("__m") >= minMatches)
      .groupBy("doc_id")
      .agg(max(col("__m")).as("best_matches"))
  }

  /** [[fuzzyOverlapVerifiedAgainst]] with corpus/benchmark carved out
    * of one frame. */
  def fuzzyOverlapVerified(
      documents: DataFrame,
      isBench: Column,
      k: Int,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5
  ): DataFrame =
    fuzzyOverlapVerifiedAgainst(
      documents.where(!isBench), documents.where(isBench),
      k, numHashes, rowsPerBand, minJaccard)
}
