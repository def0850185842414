package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. All integer/string outputs — exactly reproducible
  * by a SQL oracle, no UDFs. Token/regex stats are codegen'd built-ins;
  * the lambda-based ones (qualityScores/langId filters) run as
  * interpreted HOFs, and the fingerprint hash is a native codegen'd
  * expression ([[graft.functions.PolyHash]]).
  */
object Text {

  /** Per-document token statistics: token count (single-space-separated),
    * distinct tokens, character counts. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq_tokens"),
      length(col("text")).cast("long").as("n_chars_text"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars_nospace")
    )

  /** Quality-score heuristics (length / mean word length / stopword ratio /
    * type-token ratio), rounded to 4dp for oracle stability. The stopword
    * count is a one-pass native token-set kernel
    * ([[graft.functions.TokenSetCounts]]) instead of an interpreted
    * `filter(toks, isin)` HOF (TextKernelSpec pins equality). */
  def qualityScores(
      documents: DataFrame,
      stopwords: Seq[String] = Seq("the", "a"),
      keep: Seq[String] = Nil
  ): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val nStop = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(stopwords))
      .getItem(0)
      .cast("double")
    documents.select(
      col("doc_id") +: keep.map(col) :+
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 4)
          .as("mean_word_len") :+
        round(nStop / nTok, 4).as("stopword_ratio") :+
        round(size(array_distinct(toks)).cast("double") / nTok, 4).as("type_token_ratio"): _*
    )
  }

  /** The interpreted-HOF stopword formulation — kept for the spec. */
  private[graft] def qualityScoresHof(documents: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double")
    documents.select(
      col("doc_id"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 4)
        .as("mean_word_len"),
      round(nStop / nTok, 4).as("stopword_ratio"),
      round(size(array_distinct(toks)).cast("double") / nTok, 4).as("type_token_ratio")
    )
  }

  /** Whitespace for the punct run class, enumerated EXPLICITLY: Java's
    * `\s` includes vertical tab (0x0B) but RE2's (DuckDB's) does not, so
    * a shorthand class would silently diverge between engine and oracle. */
  val WhitespaceClass = " \\t\\n\\r\\x0B\\f"

  /** BPE-ish regex tokenization stats: run counts per character class
    * (alpha / numeric / punctuation) — the pre-tokenizer split a BPE
    * vocabulary sees. One codegen'd byte pass
    * ([[graft.functions.CharClassRuns]]) instead of three full
    * `regexp_extract_all` scans; byte-level run counting is exact for
    * these ASCII classes (non-ASCII chars are byte-contiguous punct —
    * TextKernelSpec pins equality with the regex formulation, which the
    * SQL oracle spells). */
  def regexTokenStats(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        graft.functions.CharClassRuns.charClassRuns(col("text")).as("__r")
      )
      .select(
        col("doc_id"),
        col("__r").getItem(0).as("n_alpha"),
        col("__r").getItem(1).as("n_num"),
        col("__r").getItem(2).as("n_punct")
      )
      .withColumn("n_bpe_tokens", col("n_alpha") + col("n_num") + col("n_punct"))
      .withColumn(
        "punct_ratio",
        round(col("n_punct").cast("double") / greatest(col("n_bpe_tokens"), lit(1L)), 4)
      )

  /** The three-regex formulation [[regexTokenStats]] replaced — what the
    * DuckDB oracle spells; kept for the equivalence spec. */
  private[graft] def regexTokenStatsHof(documents: DataFrame): DataFrame = {
    def runs(pattern: String): org.apache.spark.sql.Column =
      size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long")
    documents
      .select(
        col("doc_id"),
        runs("[A-Za-z]+").as("n_alpha"),
        runs("[0-9]+").as("n_num"),
        runs(s"[^A-Za-z0-9$WhitespaceClass]+").as("n_punct")
      )
      .withColumn("n_bpe_tokens", col("n_alpha") + col("n_num") + col("n_punct"))
      .withColumn(
        "punct_ratio",
        round(col("n_punct").cast("double") / greatest(col("n_bpe_tokens"), lit(1L)), 4)
      )
  }

  /** Deterministic rolling-hash document fingerprint: polynomial hash of
    * the text bytes, base 31 mod 1e9+7 (modulus keeps the accumulator in
    * Long range — ANSI-safe and engine-portable), plus md5. The hash is
    * a native codegen'd byte-iterating expression
    * ([[graft.functions.PolyHash]]) — the HOF formulation
    * (`aggregate(transform(split(text,''), ...))`) materialized a
    * per-char array per row and ran the fold interpreted. Identical
    * values on ASCII text (the documents contract). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("md5_hex"),
      graft.functions.PolyHash.polyHash(col("text")).as("poly_hash")
    )

  /** Winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    * algorithm): hash every token k-gram, then in each sliding window
    * of `w` consecutive gram hashes keep the MINIMUM (rightmost
    * occurrence on ties), emitting the distinct (pos, fp) selections.
    * Guarantees: any shared substring of ≥ w+k−1 tokens between two
    * documents shares at least one fingerprint — the partial-overlap
    * dedup/plagiarism signal a whole-doc hash ([[fingerprints]]) and
    * doc-level MinHash both miss.
    *
    * Gram hash is the same base-31 mod 1e9+7 polynomial as
    * [[fingerprints]] (engine-portable, SQL-replicable). The whole
    * operator is a stateless projection — the native
    * [[graft.functions.WinnowFps]] monotonic-deque kernel, O(tokens)
    * per doc, no shuffle at any scale ([[winnowFingerprintsHof]] is
    * the retained equivalence oracle). Docs shorter than w+k−1 tokens
    * emit nothing (no complete window). */
  def winnowFingerprints(documents: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"bad params k=$k w=$w")
    documents
      .select(
        col("doc_id"),
        explode(graft.functions.WinnowFps.winnowFps(col("text"), k, w)).as("sel"))
      .select(
        col("doc_id"),
        col("sel.pos").as("pos"),
        col("sel.fp").as("fp"))
  }

  /** The HOF formulation of [[winnowFingerprints]] — O(n·w)
    * interpreted, retained ONLY as the equivalence oracle for the
    * native [[graft.functions.WinnowFps]] kernel (TextFilterSpec
    * parity; measured 89 s vs 1.23 s at the 100× bench row). */
  private[graft] def winnowFingerprintsHof(documents: DataFrame, k: Int, w: Int): DataFrame = {
    val grams = graft.functions.ShingleArray.shingleArray(col("text"), k, dedup = false)
    val hashes = transform(grams, g => graft.functions.PolyHash.polyHash(g))
    val n = size(hashes)
    val starts = when(n >= w, sequence(lit(0), n - w)).otherwise(lit(Array.empty[Int]))
    // rightmost-min per window: fold (h, j) over the window, <= keeps
    // the later position on equal hashes
    val winnowed = transform(starts, i =>
      aggregate(
        sequence(i, i + w - 1),
        struct(lit(Long.MaxValue).as("fp"), lit(-1).as("pos")),
        (acc, j) => when(
          element_at(hashes, j + 1) <= acc.getField("fp"),
          struct(element_at(hashes, j + 1).as("fp"), j.as("pos")))
          .otherwise(acc)))
    documents
      .select(col("doc_id"), explode(array_distinct(winnowed)).as("sel"))
      .select(
        col("doc_id"),
        col("sel.pos").as("pos"),
        col("sel.fp").as("fp"))
  }

  /** Partial-overlap candidate pairs from [[winnowFingerprints]] — the
    * MOSS report: doc pairs sharing ≥ `minShared` winnow fingerprints,
    * i.e. pairs with substring-level copying a doc-level MinHash
    * misses. Same bucket shape as the LSH families (fingerprint →
    * member list → pairs from ONE aggregate, no all-pairs);
    * `maxDocFreq` sheds ubiquitous fingerprints (stop-phrase grams)
    * before the pair explode — the [[DedupDocs]] doc-freq-cap lesson.
    *
    * The bucket aggregate is the capped-set kernel
    * ([[graft.functions.CappedLongSet]]): a stop-phrase fingerprint's
    * member list SATURATES (and frees) the moment it exceeds the df
    * cap — map-side partials dedup and saturate before the exchange,
    * so the over-cap buckets the filter would discard never shuffle
    * their members or merge their lists, and the formerly separate
    * `distinct()` pass rides the same aggregate (one exchange total,
    * down from two). Output-identical to the collect_set formulation
    * (retained below as the equivalence oracle). */
  def winnowOverlapPairs(
      documents: DataFrame,
      k: Int,
      w: Int,
      minShared: Long,
      maxDocFreq: Int = 50
  ): DataFrame = {
    val fps = winnowFingerprints(documents, k, w).select("doc_id", "fp")
    val buckets = fps
      .groupBy("fp")
      .agg(graft.functions.CappedLongSet.cappedSet(col("doc_id"), maxDocFreq).as("docs"))
      .where(col("docs").isNotNull && size(col("docs")) > 1)
    graft.ops.DedupDocs.explodePairs(buckets)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The collect_set formulation [[winnowOverlapPairs]] replaced —
    * retained ONLY as the equivalence oracle (TextFilterSpec parity):
    * it materializes every bucket's full member list (incl. the
    * over-cap ones the filter then discards) and needs a separate
    * distinct() exchange. */
  private[graft] def winnowOverlapPairsCollect(
      documents: DataFrame,
      k: Int,
      w: Int,
      minShared: Long,
      maxDocFreq: Int = 50
  ): DataFrame = {
    val fps = winnowFingerprints(documents, k, w).select("doc_id", "fp").distinct()
    val buckets = fps
      .groupBy("fp")
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .where(size(col("docs")) > 1 && size(col("docs")) <= maxDocFreq)
    graft.ops.DedupDocs.explodePairs(buckets)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-document keyword extraction: the top-k whitespace tokens by
    * tf·idf (idf = ln(1 + N/df), the smooth form — strictly positive,
    * so ubiquitous tokens still rank below everything rare instead of
    * tying at zero). The per-document summarization/tagging primitive
    * ([[topNgrams]] is its corpus-level sibling; [[Bm25]] the
    * query-time scorer over the same statistics).
    *
    * Shape: ONE (doc, token) rollup — lineage-cut, it feeds both the
    * document-frequency rollup and the score join — then a per-doc
    * top-k window. Every exchange is bounded by distinct (doc, token)
    * pairs / vocabulary; N is one count action (the [[Bm25]]
    * precedent). Scores are 4dp-rounded on both engine and oracle
    * sides BEFORE ranking (the lm-score precedent for log-derived
    * values), ties broken by token bytewise.
    */
  def keywordsTfIdf(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nDocs = documents.count()
    val toks = documents.select(
      col("doc_id"),
      explode(filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)).as("token"))
    // tf appears twice (its own branch + the df rollup) but stays LAZY:
    // both consumers sit above the SAME canonical exchange, so
    // ReuseExchange/AQE stage reuse runs the tokenize+explode+partial-agg
    // once and only the cheap final aggregates re-fold — measured 2.82 →
    // 1.36 s at sf0.1 vs the r17 double lineage-cut spelling, whose two
    // extra materialize+count actions and cache write cost more than
    // they saved (tools/R18TfidfProbe; arithmetic unchanged).
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    tf
      .join(dfT, "token")
      .withColumn("score",
        round(col("tf") * log(lit(1.0) + lit(nDocs.toDouble) / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rank")
  }

  /** Unigram-distribution drift between two corpora: Jensen–Shannon
    * divergence over the whitespace-token distributions — the TEXT
    * counterpart of [[Profile.drift]]'s numeric gate (a crawl batch
    * whose token mix shifts — new language, new boilerplate, spam
    * burst — moves JS long before any numeric column does). Returns
    * ONE row: token totals, union vocabulary size, and `js` ∈
    * [0, ln 2] at 6dp.
    *
    * Determinism across engines AND partitionings: a corpus-wide
    * float Σ p·ln(p/m) is order-sensitive (float addition is not
    * associative — Spark's own partial sums vary with partitioning),
    * so each token's JS contribution is rounded to 12dp and summed as
    * exact DECIMAL (associative, partition-order-free); only the
    * per-term double (the [[keywordsTfIdf]] ln precedent) and one
    * final 6dp round involve floats. Shape: one token rollup per
    * side, one full outer join on token, one singleton fold — bounded
    * by vocabulary, never corpus size.
    */
  def tokenDrift(before: DataFrame, after: DataFrame): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as(out))
    val a = counts(before, "ca")
    val b = counts(after, "cb")
    // token-count table is referenced twice (totals fold, term pass) —
    // cut its lineage so tokenization runs once per side
    val (joined, joinedRdd) = graft.util.LoopFrames.cut(
      a.join(b, Seq("token"), "full_outer")
        .select(col("token"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")))
    // totals become driver-side literals via ONE tiny fold (the Bm25
    // nDocs precedent): per-term probabilities need NA/NB as scalars,
    // and attaching a one-row frame join-free has no clean plan shape
    val (naV, nbV) = {
      val r = joined.agg(sum("ca"), sum("cb")).head()
      (r.getLong(0), r.getLong(1))
    }
    require(naV > 0 && nbV > 0, "tokenDrift needs non-empty corpora on both sides")
    val pa = col("ca").cast("double") / lit(naV.toDouble)
    val pb = col("cb").cast("double") / lit(nbV.toDouble)
    val m = (pa + pb) / 2.0
    val term =
      when(col("ca") > 0, pa * log(pa / m) / 2.0).otherwise(lit(0.0)) +
        when(col("cb") > 0, pb * log(pb / m) / 2.0).otherwise(lit(0.0))
    val out = joined
      .select(round(term, 12).cast("decimal(38,12)").as("__t"))
      .agg(count(lit(1)).as("n_vocab"), sum("__t").as("__js"))
      .select(
        lit(naV).as("n_tokens_a"),
        lit(nbV).as("n_tokens_b"),
        col("n_vocab"),
        round(col("__js").cast("double"), 6).as("js"))
    // materialize (lineage-cut) before releasing the shared cache
    val (res, _) = graft.util.LoopFrames.cut(out)
    res.count()
    joinedRdd.unpersist(blocking = false)
    res
  }

  /** Compression-ratio quality signal: deflate(text) size over raw
    * UTF-8 size — templated/boilerplate/machine-generated text
    * compresses far below natural prose, so a LOW ratio is a drop/
    * down-weight flag (the heuristic FineWeb-class pipelines pair with
    * the Gopher rules). Stateless projection over the native
    * [[graft.functions.DeflateSize]] kernel — zero shuffle. Ratio is
    * 4dp-rounded; an empty doc still carries the 2-byte raw-deflate
    * terminator (ratio 2.0 via the max(bytes,1) denominator — callers
    * gate on length first). NOT SQL-replicable (no deflate
    * in the oracle engine) → rows-only driver check + spec-pinned
    * semantics. */
  def compressionRatio(documents: DataFrame): DataFrame = {
    val nComp = graft.functions.DeflateSize.deflateSize(col("text")).cast("long")
    documents.select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      nComp.as("n_deflate"),
      round(nComp.cast("double") /
        greatest(octet_length(col("text")).cast("long"), lit(1L)).cast("double"), 4)
        .as("compress_ratio"))
  }

  /** Per-document OOV rate against the corpus's own top-`vocabSize`
    * unigram vocabulary — the tokenizer-coverage report (how much of
    * each doc a fixed vocab fails to cover; high OOV → the doc is in
    * the wrong language/script for the tokenizer, or the vocab is too
    * small). Vocabulary = top-N by (count desc, token asc) — computed
    * once at plan-build time (the [[Bm25]]/[[Lm]] model-build
    * lifecycle: an O(vocab) aggregate, driver-collected) and folded
    * into the one-pass [[graft.functions.TokenSetCounts]] kernel as a
    * literal set, so scoring is a stateless projection: no explode, no
    * join, zero shuffle over the corpus. */
  /** Flesch readability over the classic vowel-run syllable heuristic —
    * the grade-level quality signal curation pipelines keep beside the
    * Gopher gates (too-low reading ease flags telegraphic/listy text,
    * too-high flags run-on machine output). Deterministic and fully
    * SQL-respellable: sentences = `[.!?]+` runs (min 1), words =
    * non-empty `[a-z]+` tokens of the lowercased text (min 1),
    * syllables per word = `[aeiouy]+` runs (min 1 per word).
    *
    * Scores are exact MILLI-POINT integers — FRE = 206.835 −
    * 1.015·(words/sentence) − 84.6·(syllables/word) and FK grade =
    * 0.39·(words/sentence) + 11.8·(syllables/word) − 15.59, each ×1000
    * and rounded half-away-from-zero via PURE INTEGER arithmetic
    * (common denominator sentences·words). Small integer inputs make
    * decimal-tie values (e.g. a power-of-two word count) COMMON, and
    * double `round(…, 4)` resolves such ties differently across
    * engines (shortest-repr HALF_UP vs binary value) — integer
    * numerator/denominator rounding is tie-free and bit-identical in
    * any engine. 64-bit safe through ~10⁶ sentences × 10⁷ syllables
    * per document. Stateless projection — zero shuffle. */
  def readability(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
    val text = col("text")
    val nSent = greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val words = filter(split(lower(text), "[^a-z]+"), w => w =!= "")
    val nWords = greatest(size(words), lit(1)).cast("long")
    val nSyll = greatest(
      aggregate(words, lit(0L), (acc, w) =>
        acc + greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))
          .cast("long")),
      lit(1L))
    // half-away-from-zero integer round of n/d (d > 0)
    def roundDiv(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) = {
      val mag = intDiv(lit(2L) * abs(n) + d, lit(2L) * d)
      when(n < 0, -mag).otherwise(mag)
    }
    documents
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        nSent.as("n_sentences"),
        nSyll.as("n_syllables"))
      .select(
        col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"), {
          val s = col("n_sentences"); val w = col("n_words"); val sy = col("n_syllables")
          roundDiv(
            lit(206835L) * s * w - lit(1015L) * w * w - lit(84600L) * sy * s,
            s * w).as("fre_milli")
        }, {
          val s = col("n_sentences"); val w = col("n_words"); val sy = col("n_syllables")
          roundDiv(
            lit(390L) * w * w + lit(11800L) * sy * s - lit(15590L) * s * w,
            s * w).as("fk_milli")
        })
  }

  def oovRate(documents: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 1000000, s"bad vocabSize $vocabSize")
    val vocab = Lm.unigramCounts(documents)
      .orderBy(col("c").desc, col("tok").asc)
      .limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
    val nTok = size(split(col("text"), " ")).cast("long")
    val inVocab = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(vocab)).getItem(0)
    documents.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (nTok - inVocab).as("n_oov"),
      round((nTok - inVocab).cast("double") / nTok.cast("double"), 4).as("oov_rate"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * k-grams that appear in NO other document (corpus doc-frequency 1)
    * — low novelty marks boilerplate/near-copies, high novelty marks
    * unique content; the doc-level memorization/duplication signal
    * behind "fraction of text duplicated elsewhere" corpus reports.
    *
    * Plan (the join-free shape): a gram with df = 1 belongs to exactly
    * one doc, so ONE (gram → count, min(doc_id)) aggregate yields both
    * the df filter AND the owning doc — no corpus-sized join back on
    * the gram key (the naive spelling's second big exchange). The
    * unique-gram counts then join per-doc totals on doc_id. Docs with
    * fewer than k tokens emit nothing. */
  def novelty(documents: DataFrame, k: Int): DataFrame = {
    val grams = documents.select(
      col("doc_id"),
      explode(graft.functions.ShingleArray.shingleArray(col("text"), k, dedup = true)).as("g"))
    val df = grams.groupBy("g").agg(count(lit(1)).as("__df"), min("doc_id").as("__d1"))
    val uniq = df.where(col("__df") === 1)
      .groupBy(col("__d1").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    val tot = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    tot
      .join(uniq, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        round(coalesce(col("n_unique"), lit(0L)).cast("double") / col("n_grams").cast("double"), 4)
          .as("novelty"))
  }

  /** n-gram-heuristic language ID: scores text against per-language marker
    * token sets and picks the best (ties → 'und'). Deterministic CASE
    * logic, mirrored verbatim in the SQL oracle. All marker sets are
    * scored by ONE pass of the native token-set kernel (one array column)
    * instead of one interpreted `filter(toks, isin)` HOF per language. */
  def langId(documents: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val langs = markers.toSeq.sortBy(_._1)
    val counts = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), langs.map(_._2))
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      lang -> counts.getItem(i)
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in sorted-lang order → first-alphabetical wins ties
    val pickFirst = scored.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (lang, s)) => Some(when(s === best && best > 0, lit(lang)))
      case (Some(c), (lang, s)) => Some(c.when(s === best && best > 0, lit(lang)))
    }.get.otherwise(lit("und"))
    documents.select(col("doc_id"), pickFirst.as("lang_pred"))
  }

  /** [[langId]] with a CONFIDENCE margin: best and second-best marker
    * counts from one sorted score array — `margin = best − second` is
    * the routing signal (margin 0 = ambiguous between two languages →
    * send to review / a heavier model; the standard cascade shape).
    * Same pick/tie semantics as [[langId]], same single kernel pass. */
  def langIdWithMargin(documents: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val langs = markers.toSeq.sortBy(_._1)
    val counts = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), langs.map(_._2))
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      lang -> counts.getItem(i)
    }
    val sorted = sort_array(array(scored.map(_._2): _*), asc = false)
    val best = sorted.getItem(0)
    // With a single-language marker map there IS no second-best score —
    // getItem(1) throws under ANSI and would otherwise silently null the
    // margin. Null-tolerant get() + coalesce treats the missing
    // runner-up as 0, so margin degrades to best_count (the doc contract
    // "margin 0 = ambiguous" stays meaningful).
    val second = coalesce(get(sorted, lit(1)), lit(0L))
    val pickFirst = scored.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (lang, s)) => Some(when(s === best && best > 0, lit(lang)))
      case (Some(c), (lang, s)) => Some(c.when(s === best && best > 0, lit(lang)))
    }.get.otherwise(lit("und"))
    documents.select(
      col("doc_id"),
      pickFirst.as("lang_pred"),
      best.as("best_count"),
      (best - second).as("margin"))
  }

  /** Gopher-style repetition quality signals over word n-grams: the
    * fraction of token occurrences whose token repeats, and for 2-/3-
    * grams the most-frequent-gram fraction and the duplicated-gram
    * occurrence fraction (all 4dp-rounded, 0.0 for docs shorter than n).
    * High values mark boilerplate/templated text a pretraining pipeline
    * down-weights or drops.
    *
    * One native kernel pass per document
    * ([[graft.functions.RepetitionStats]] — all three n's share one
    * tokenization, byte-exact span counting) instead of an explode →
    * groupBy(doc, gram) → groupBy(doc) double exchange per n
    * ([[repetitionExploded]], kept as the equivalence oracle — what the
    * SQL oracle spells). Per-doc state is bounded by document length, so
    * the whole operator is a stateless projection: no shuffle at any
    * scale. */
  def repetition(documents: DataFrame): DataFrame = {
    val r = graft.functions.RepetitionStats.repetitionStats(col("text"), Seq(1, 2, 3))
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round(num.cast("double") / greatest(den, lit(1L)).cast("double"), 4)
    documents
      .select(col("doc_id"), r.as("__r"))
      .select(
        col("doc_id"),
        col("__r").getItem(0).as("n_tokens"),
        frac(col("__r").getItem(2), col("__r").getItem(0)).as("dup_token_frac"),
        frac(col("__r").getItem(4), col("__r").getItem(3)).as("top_2gram_frac"),
        frac(col("__r").getItem(5), col("__r").getItem(3)).as("dup_2gram_frac"),
        frac(col("__r").getItem(7), col("__r").getItem(6)).as("top_3gram_frac"),
        frac(col("__r").getItem(8), col("__r").getItem(6)).as("dup_3gram_frac")
      )
  }

  /** Encoding-artifact (mojibake) detection — the ftfy-class screen a
    * CommonCrawl-derived pipeline runs before any content analysis:
    * UTF-8 bytes decoded as Latin-1/cp1252 leave fingerprint
    * characters ('Ã'/'Â' lead bytes, 'â€¦'-family punctuation runs,
    * the '€'/'™'/'œ' cp1252 tails) and lossy transcodes leave U+FFFD
    * replacement chars. Counts both classes per document and flags any
    * hit — a stateless projection (two codegen'd regexp counts), no
    * shuffle at any scale.
    *
    * Heuristic, by design: a genuine Portuguese "não" written in
    * NFC never matches ('ã' alone is not in the indicator set); the
    * indicator chars are the ones essentially absent from clean text
    * in ANY language ('Ã'/'Â'/'â' followed by a cp1252 symbol tail,
    * or standalone '€'-family symbols glued to letters are what
    * double-decoding manufactures). */
  def encodingArtifacts(documents: DataFrame, textCol: String = "text"): DataFrame = {
    // lead char immediately followed by a continuation-byte tail: the
    // two-char shape only a double-decode produces. Tails: U+0080-00BF
    // (UTF-8 continuation bytes read as Latin-1) plus the 27 codepoints
    // cp1252 maps the 0x80-9F control range to.
    val mojibake = regexp_count(col(textCol), lit("[\u00C3\u00C2\u00E2][\\u0080-\\u00BF\\u20AC\\u201A\\u0192\\u201E\\u2026\\u2020\\u2021\\u02C6\\u2030\\u0160\\u2039\\u0152\\u017D\\u2018\\u2019\\u201C\\u201D\\u2022\\u2013\\u2014\\u02DC\\u2122\\u0161\\u203A\\u0153\\u017E\\u0178]"))
    val replacement = regexp_count(col(textCol), lit("�"))
    documents.select(
      col("doc_id"),
      mojibake.as("n_mojibake"),
      replacement.as("n_replacement"),
      (mojibake + replacement > 0).cast("int").as("encoding_suspect"))
  }

  /** The distributed explode/groupBy formulation [[repetition]] replaced
    * — kept for the equivalence spec (and what the DuckDB oracle
    * spells). */
  private[graft] def repetitionExploded(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    def gramStats(n: Int) = {
      val grams = documents.select(
        col("doc_id"),
        explode(
          when(
            size(toks) >= n,
            transform(
              sequence(lit(0), size(toks) - n),
              i => concat_ws(" ", slice(toks, i + 1, lit(n)))
            )
          ).otherwise(array().cast("array<string>"))
        ).as("g")
      )
      grams
        .groupBy("doc_id", "g")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(
          sum("c").as("total"),
          max("c").as("top"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup")
        )
    }
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round(num.cast("double") / greatest(den, lit(1L)).cast("double"), 4)
    val s1 = gramStats(1)
    val s2 = gramStats(2)
    val s3 = gramStats(3)
    documents
      .select(col("doc_id"))
      .join(s1, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("total"), lit(0L)).as("n_tokens"),
        frac(coalesce(col("dup"), lit(0L)), coalesce(col("total"), lit(0L))).as("dup_token_frac")
      )
      .join(
        s2.select(
          col("doc_id"),
          frac(col("top"), col("total")).as("top_2gram_frac"),
          frac(col("dup"), col("total")).as("dup_2gram_frac")
        ),
        Seq("doc_id"),
        "left"
      )
      .join(
        s3.select(
          col("doc_id"),
          frac(col("top"), col("total")).as("top_3gram_frac"),
          frac(col("dup"), col("total")).as("dup_3gram_frac")
        ),
        Seq("doc_id"),
        "left"
      )
      .na.fill(0.0, Seq("top_2gram_frac", "dup_2gram_frac", "top_3gram_frac", "dup_3gram_frac"))
  }

  /** Corpus-level vocabulary mining: the top-k word n-grams per group by
    * occurrence count (count desc, gram asc — a total order, so results
    * are deterministic under any execution order). The shape tokenizer
    * training and boilerplate mining need.
    *
    * Physical plan: one (group, ngram) hash aggregate — the classic
    * word-count exchange, map-side partial agg collapses each
    * partition's repeats before the shuffle — then a per-group
    * row_number window over the AGGREGATED (distinct-gram) stream.
    * `minCount` prunes the window's input before the sort: at 100 TB
    * the distinct-gram tail is the bulk of the stream and a tokenizer
    * run never wants hapax n-grams, so the filter turns the per-group
    * sort from O(distinct grams) into O(grams seen >= minCount).
    *
    * Gram generation is the non-dedup mode of the zero-copy
    * [[graft.functions.ShingleArray]] kernel (every occurrence, in
    * order) — the interpreted `transform(sequence)(slice + concat_ws)`
    * HOF chain it replaces measured 4× slower end-to-end here
    * ([[topNgramsHof]], kept as the equivalence oracle). */
  def topNgrams(
      documents: DataFrame,
      n: Int,
      k: Int,
      groupCols: Seq[String] = Seq("source"),
      minCount: Long = 1L
  ): DataFrame = {
    val grams = documents.select(
      (groupCols.map(col) :+
        explode(
          graft.functions.ShingleArray.shingleArray(col("text"), n, dedup = false)
        ).as("ngram")): _*
    )
    val counts = grams
      .groupBy((groupCols.map(col) :+ col("ngram")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The interpreted-HOF gram generation [[topNgrams]] replaced — what
    * the DuckDB oracle spells; kept for the equivalence spec. */
  private[graft] def topNgramsHof(
      documents: DataFrame,
      n: Int,
      k: Int,
      groupCols: Seq[String] = Seq("source"),
      minCount: Long = 1L
  ): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = documents.select(
      (groupCols.map(col) :+
        explode(
          when(
            size(toks) >= n,
            transform(
              sequence(lit(0), size(toks) - n),
              i => concat_ws(" ", slice(toks, i + 1, lit(n)))
            )
          ).otherwise(array().cast("array<string>"))
        ).as("ngram")): _*
    )
    val counts = grams
      .groupBy((groupCols.map(col) :+ col("ngram")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** [[topNgrams]] via the bounded-memory [[graft.functions
    * .SpaceSavingTopK]] sketch — the 100 TB path for vocab mining: the
    * exact form's one exchange carries EVERY distinct n-gram (the
    * correct answer locally, an impossible exchange over trillions of
    * distinct grams), while this one carries one capacity-bounded
    * summary per (partition, group) and answers with an error
    * certificate: output rows add `err`, with
    * `est ≤ true ≤ est + err` and every gram of true count > err
    * guaranteed present. err = 0 ⟺ the summary never compacted ⟺
    * counts are exact and the result EQUALS [[topNgrams]] (the regime
    * the q_top_ngrams_sketch oracle pins; the compaction regime is
    * spec-pinned against exact recounts — TopKSketchSpec).
    *
    * Capacity sizing: per-group distinct grams ≤ capacity keeps err at
    * 0; past that, memory stays O(capacity) and err grows as the
    * deducted mass. The heavy-hitter guarantee needs
    * capacity ≳ group-gram-count / target-min-frequency.
    *
    * MEMORY MODEL (sized the hard way — an oversized capacity OOMs, r11
    * TopNgramsBench): Spark's ObjectHashAggregate holds every group's
    * summary per task, so a task costs
    * `n_groups × 2 × capacity × ~140 B` once group universes saturate
    * (maps grow lazily — small groups never pay). At 32 tasks × 20
    * groups, capacity 2¹⁶ is ~11 GB (OOM on a 16 GB heap) while 2¹³ is
    * ~1.4 GB. Size capacity to
    * `heap_budget / (tasks × groups × 280 B)`. */
  def topNgramsSketch(
      documents: DataFrame,
      n: Int,
      k: Int,
      capacity: Int,
      groupCols: Seq[String] = Seq("source"),
      minCount: Long = 1L
  ): DataFrame = {
    val grams = documents.select(
      (groupCols.map(col) :+
        explode(
          graft.functions.ShingleArray.shingleArray(col("text"), n, dedup = false)
        ).as("ngram")): _*
    )
    val sketched = grams
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.SpaceSavingTopK.topkSketch(col("ngram"), capacity).as("__top"))
      .select((groupCols.map(col) :+ explode(col("__top")).as("e")): _*)
      .select(
        (groupCols.map(col) :+
          col("e.item").as("ngram") :+
          col("e.est").as("n_occurrences") :+
          col("e.err").as("err")): _*)
      .where(col("n_occurrences") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
    sketched
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The per-language interpreted-HOF formulation — kept for the spec. */
  private[graft] def langIdHof(documents: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms.map(lit(_)): _*)))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pickFirst = scored.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (lang, s)) => Some(when(s === best && best > 0, lit(lang)))
      case (Some(c), (lang, s)) => Some(c.when(s === best && best > 0, lit(lang)))
    }.get.otherwise(lit("und"))
    documents.select(col("doc_id"), pickFirst.as("lang_pred"))
  }

  /** Per-source corpus report: doc counts, token totals, token-count
    * percentiles, mean chars — the summary a mixture designer reads
    * before setting [[Mixture]] weights. This EXACT-percentile form is
    * the oracle contract; `percentile` buffers every group value, so at
    * 100 TB use [[corpusStatsApprox]] (t-digest sketch: mergeable,
    * map-side combinable, bounded memory) and accept the documented
    * error bound. */
  def corpusStats(documents: DataFrame): DataFrame =
    corpusStatsWith(documents,
      nt => expr(s"percentile($nt, 0.5)"),
      nt => expr(s"percentile($nt, 0.9)"))

  /** The scale form: `approx_percentile` (t-digest). Same schema. */
  def corpusStatsApprox(documents: DataFrame, accuracy: Int = 10000): DataFrame =
    corpusStatsWith(documents,
      nt => expr(s"approx_percentile($nt, 0.5, $accuracy)").cast("double"),
      nt => expr(s"approx_percentile($nt, 0.9, $accuracy)").cast("double"))

  private def corpusStatsWith(
      documents: DataFrame,
      p50: String => org.apache.spark.sql.Column,
      p90: String => org.apache.spark.sql.Column
  ): DataFrame =
    documents
      .select(
        col("source"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("__nt"),
        length(col("text")).cast("long").as("__nc"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").as("total_tokens"),
        round(avg("__nt"), 4).as("mean_tokens"),
        round(p50("__nt"), 4).as("p50_tokens"),
        round(p90("__nt"), 4).as("p90_tokens"),
        round(avg("__nc"), 4).as("mean_chars"))

  /** Context-window chunking: split each document's whitespace tokens
    * into windows of `size` tokens whose starts advance by
    * `size − overlap` — the long-document → training-example step of a
    * pretraining pipeline. Starts are `0, step, 2·step, … < n_tokens`,
    * so every token lands in ≥ 1 chunk, consecutive chunks share
    * `overlap` tokens, and the last chunk may be short (a document
    * shorter than `size` yields exactly one chunk). Chunk text re-joins
    * with single spaces — the same lossy-on-space-runs convention as
    * every token op here (and the SQL oracle).
    *
    * One generate per doc, no shuffle, no join: at 100 TB this is a
    * stateless map whose output is partitioned exactly like its input.
    * Output: `(doc_id, chunk_id, n_chunk_tokens, chunk_text)`. */
  def chunkDocs(documents: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size, s"overlap must be in [0, size), got $overlap")
    val step = size - overlap
    documents
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(
        col("doc_id"),
        col("__toks"),
        explode(sequence(
          lit(0),
          floor((org.apache.spark.sql.functions.size(col("__toks")) - 1) / step).cast("int")
        )).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        least(
          lit(size),
          org.apache.spark.sql.functions.size(col("__toks")) - col("chunk_id") * step
        ).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("chunk_id") * step + 1, lit(size)), " ").as("chunk_text"))
  }

  /** Per-group vocabulary size (distinct tokens) — exact and HLL forms.
    * The exact form's distinct aggregate must ship every (group, token)
    * pair to its reducer (partial distinct collapses repeats map-side,
    * but the distinct-key set itself crosses the wire: O(vocab) per
    * group); the HLL form ([[vocabSizeApprox]], Spark's built-in
    * HyperLogLog++) exchanges one fixed ~KB sketch per group per
    * partition regardless of vocabulary — the 100 TB form, with rsd the
    * accuracy knob. VocabSketchSpec measures the actual error against
    * the exact count (the topNgramsSketch honesty precedent: report the
    * bound, measure the reality). */
  def vocabSize(documents: DataFrame, groupCols: Seq[String]): DataFrame =
    documents
      .select(groupCols.map(col) :+ explode(split(col("text"), " ")).as("__tok"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col("__tok")).as("vocab"))

  /** HLL++ twin of [[vocabSize]]: `rsd` = target relative standard
    * deviation (Spark default 0.05). */
  def vocabSizeApprox(documents: DataFrame, groupCols: Seq[String], rsd: Double = 0.05): DataFrame =
    documents
      .select(groupCols.map(col) :+ explode(split(col("text"), " ")).as("__tok"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col("__tok"), rsd).as("vocab_approx"))

  /** PMI collocation mining — pointwise mutual information over corpus
    * bigrams, the lexical-statistics step behind tokenizer vocabulary
    * decisions and multi-word-expression detection:
    *
    *   pmi(a,b) = ln( (c_ab / N₂) / ((c_a / N₁) · (c_b / N₁)) )
    *
    * All counts are exact integers (bigrams via the zero-copy
    * [[graft.functions.ShingleArray]] kernel, occurrences not distinct),
    * so the doubles are one fixed arithmetic spelling away from the
    * counts — oracle-identical. Two corpus token passes (bigram +
    * unigram aggregates, both map-side combinable), the unigram count
    * table count-gate-broadcast onto the surviving (≥ minCount) bigrams
    * — at corpus scale the bigram aggregate is the only big exchange.
    * Output: top-`k` by (4dp pmi desc, bigram) among bigrams with
    * c_ab ≥ minCount. */
  def pmiBigrams(documents: DataFrame, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad params minCount=$minCount k=$k")
    val toks = split(col("text"), " ")
    val totals = documents
      .agg(
        sum(size(toks)).cast("double").as("n1"),
        sum(greatest(size(toks) - 1, lit(0))).cast("double").as("n2"))
      .head()
    val n1 = totals.getDouble(0)
    val n2 = totals.getDouble(1)
    val uni = documents
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // The unigram table is referenced TWICE below (w1 + w2 joins), and a
    // count-then-join gate would run the aggregate a third time — the
    // repeated-subtree rule. Shared limit-probe recipe:
    // [[graft.util.DriverSide]] (local relation within the cap,
    // CacheRegistry-tracked persist past it).
    val uniB = graft.util.DriverSide.smallSideOrTracked(uni)
    val bi = documents
      .select(explode(graft.functions.ShingleArray.shingleArray(col("text"), 2, dedup = false)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    bi
      .join(uniB.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uniB.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .select(
        col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        round(
          log((col("c_ab").cast("double") / lit(n2)) /
            ((col("c_a").cast("double") / lit(n1)) * (col("c_b").cast("double") / lit(n1)))),
          4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** Gopher-style rule filter (Rae et al. 2021 §A1.1, the canonical
    * heuristic baseline every curation pipeline starts from): token
    * count in [minTokens, maxTokens], mean word length in [minMwl,
    * maxMwl], stopword ratio ≥ minStopRatio, type-token ratio ≥ minTtr.
    * Emits every signal plus the combined verdict so downstream can
    * re-cut thresholds without recomputing, one stateless pass, no
    * shuffle. Thresholds are parameters — the published constants
    * assume real prose; callers tune for their corpus. */
  def gopherFilter(
      documents: DataFrame,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMwl: Double = 3.0,
      maxMwl: Double = 10.0,
      minStopRatio: Double = 0.01,
      minTtr: Double = 0.1,
      stopwords: Seq[String] = Seq("the", "a"),
      keepCols: Seq[String] = Nil
  ): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val nTokD = nTok.cast("double")
    val mwl = round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTokD, 4)
    val stopR = round(
      graft.functions.TokenSetCounts.tokenSetCounts(col("text"), Seq(stopwords))
        .getItem(0).cast("double") / nTokD, 4)
    val ttr = round(size(array_distinct(toks)).cast("double") / nTokD, 4)
    documents
      .select(Seq(col("doc_id"), nTok.as("n_tokens"), mwl.as("mean_word_len"),
        stopR.as("stopword_ratio"), ttr.as("type_token_ratio")) ++ keepCols.map(col): _*)
      .withColumn("passes",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_word_len") >= minMwl && col("mean_word_len") <= maxMwl &&
          col("stopword_ratio") >= minStopRatio &&
          col("type_token_ratio") >= minTtr).cast("int"))
  }

  /** HTML → text: strip tags, decode the five standard entities, collapse
    * the whitespace the removal leaves behind — the extraction step
    * between a crawl dump and every text op here. Regex-only (RE2-safe
    * pattern, same spelling as the SQL oracle), stateless per-row map.
    * Script/style blocks drop with their CONTENT (a bare tag-strip would
    * leak javascript into the corpus). */
  def stripHtml(documents: DataFrame, textCol: String = "text"): DataFrame = {
    // per-tag non-greedy DOTALL blocks: a '[^<]*' body would fail on any
    // script containing '<' (comparisons, HTML strings — i.e. most real
    // scripts) and leak its mangled content; separate script/style
    // patterns also refuse mismatched pairs like <script>...</style>
    val noScript = regexp_replace(
      col(textCol), "(?is)<script[^>]*>.*?</script>", " ")
    val noBlocks = regexp_replace(
      noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    documents.select(
      col("doc_id"),
      trim(regexp_replace(decoded, " +", " ")).as("clean_text"))
  }

  /** Canonical text normalization — the cleaning step every dedup /
    * fingerprint / tokenize pass assumes has already happened: space
    * runs collapse to one space, case folds to lower, and Unicode
    * composes to NFC ([[graft.functions.NfcNormalize]], a codegen'd
    * native expression — Spark has no NFC built-in) so decomposed
    * e+◌́ and precomposed é become the same bytes. Order matters and is
    * part of the contract (and the SQL oracle): collapse → lower → NFC.
    * Stateless per-row map: no shuffle, output partitioned like input,
    * ASCII rows take a branchy byte-scan fast path with no allocation. */
  def normalizeDocs(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(
      col("doc_id"),
      graft.functions.NfcNormalize
        .nfc(lower(regexp_replace(col(textCol), " +", " ")))
        .as("norm_text"))

  /** Per-key percentile gate — "keep the top (1−p) of each language /
    * source by quality score", the threshold step between a scorer
    * ([[qualityScores]], [[graft.ops.QualityClassifier]]) and the kept
    * corpus. A row survives when its `percent_rank()` within its key
    * group (ascending by score) is ≥ `minPercentile`.
    *
    * Scale shape: the textbook spelling — `percent_rank() OVER
    * (PARTITION BY lang ORDER BY score)` — sorts EVERY row of a key
    * inside one task; with a handful of languages over a 100 TB corpus
    * that is a single-task cliff. Instead the rank is computed on the
    * (key, score) HISTOGRAM: one map-side-combinable aggregate builds
    * per-(key, rounded-score) counts (bounded by |keys| × |distinct
    * rounded scores| — thousands, not corpus-sized), a window over that
    * tiny frame turns cumulative counts into the exact same
    * `(rank−1)/(n−1)` values, and the per-score ranks broadcast back
    * onto the corpus (count-gated; shuffled join fallback beyond the
    * gate). The corpus itself never sorts and never shuffles on the
    * broadcast path. Scores must be pre-rounded (they are, 4dp) so the
    * histogram is exact, not approximate.
    *
    * Output: input columns + `pct` (the percent_rank, 6dp), filtered to
    * survivors. Ties share a rank (min-rank semantics, same as SQL
    * `percent_rank`); a single-row group ranks 0. */
  def percentileGate(
      scored: DataFrame,
      scoreCol: String,
      keyCols: Seq[String],
      minPercentile: Double
  ): DataFrame = {
    require(minPercentile >= 0.0 && minPercentile <= 1.0,
      s"minPercentile must be in [0, 1], got $minPercentile")
    require(keyCols.nonEmpty, "keyCols must be non-empty (global gating: pass a constant key)")
    val keys = keyCols.map(col)
    val hist = scored
      .groupBy(keys :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keyCols.map(col): _*)
    val wOrd = w.orderBy(col(scoreCol).asc)
    // less = rows strictly below this score; n = group size. percent_rank
    // = (rank−1)/(n−1) with min-rank ties ⇒ exactly less/(n−1).
    val ranked = hist
      .withColumn("__less", coalesce(
        sum(col("__cnt")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(w))
      .select(
        (keys :+ col(scoreCol)) :+
          when(col("__n") > 1L, col("__less").cast("double") / (col("__n") - 1L).cast("double"))
            .otherwise(lit(0.0)).as("__pr"): _*)
      .where(col("__pr") >= minPercentile)
    // The histogram is tiny by construction (|keys| × distinct ROUNDED
    // scores), so collect it ONCE and rebuild a local relation: a
    // count-then-join spelling would execute the scored→histogram
    // pipeline twice (once for the broadcast gate's count, once in the
    // final plan) — measured as the dominant cost of q_curriculum's
    // anneal subtree. Shared limit-probe recipe:
    // [[graft.util.DriverSide]].
    val rankedSide = graft.util.DriverSide.smallSideOrTracked(ranked)
    scored
      .join(rankedSide, keyCols :+ scoreCol)
      .withColumn("pct", round(col("__pr"), 6))
      .drop("__pr")
  }

  /** Zipf-law fit over the corpus token frequencies — the vocabulary-
    * health diagnostic (natural text follows freq ∝ rank^(−s) with
    * s ≈ 1; template/boilerplate-heavy or synthetic corpora bend the
    * curve): OLS of ln(freq) on ln(rank) over the `topN` highest-
    * frequency tokens, slope + R².
    *
    * Determinism contract (oracle-replayable): ranks are exact
    * integers over the (count DESC, token ASC) total order; per-term
    * ln products are 12dp-rounded and summed as DECIMAL (partition-
    * order-free); slope/R² are closed-form ratios of those exact sums,
    * 6dp each. The regression frame is bounded by `topN` (≤ 10k), so
    * the total-order window is tiny no matter the corpus.
    *
    * @return one row: (n_tokens, n_vocab, top_n, zipf_slope, r2)
    */
  def zipfFit(documents: DataFrame, topN: Int = 1000): DataFrame = {
    require(topN >= 3 && topN <= 10000, s"topN must be in [3, 10000], got $topN")
    val toks = documents
      .select(explode(filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("__c"))
    val (counts, countsRdd) = graft.util.LoopFrames.cut(toks)
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c").desc, col("token").asc)
    val ranked = counts
      .withColumn("__r", row_number().over(ord))
      .where(col("__r") <= topN)
    def t12(c: Column): Column = round(c, 12).cast("decimal(38,12)")
    val x = log(col("__r").cast("double"))
    val y = log(col("__c").cast("double"))
    // totals become driver-side literals via ONE tiny fold (the
    // tokenDrift/Bm25 precedent — attaching a one-row frame join-free
    // has no clean plan shape)
    val (nTokens, nVocab) = {
      val r = counts.agg(sum(col("__c")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val out = ranked
      .agg(
        count(lit(1)).as("n"),
        sum(t12(x)).as("sx"),
        sum(t12(y)).as("sy"),
        sum(t12(x * y)).as("sxy"),
        sum(t12(x * x)).as("sxx"),
        sum(t12(y * y)).as("syy"))
      .select(lit(nTokens).as("n_tokens"), lit(nVocab).as("n_vocab"),
        col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
    val nD = col("n").cast("double")
    def d(c: Column): Column = c.cast("double")
    val slopeNum = nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val slopeDen = nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val r2Den = slopeDen * (nD * d(col("syy")) - d(col("sy")) * d(col("sy")))
    val shaped = out.select(
      col("n_tokens"), col("n_vocab"), col("n").as("top_n"),
      when(slopeDen =!= 0.0, round(slopeNum / slopeDen, 6)).as("zipf_slope"),
      when(r2Den =!= 0.0, round(slopeNum * slopeNum / r2Den, 6)).as("r2"))
    // materialize (lineage-cut) the one-row result before releasing the
    // shared token-count cache
    val (res, _) = graft.util.LoopFrames.cut(shaped)
    res.count()
    countsRdd.unpersist(blocking = false)
    res
  }
}
