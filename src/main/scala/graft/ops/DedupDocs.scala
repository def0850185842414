package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for a training-data pipeline: exact, MinHash/LSH,
  * n-gram Jaccard, SimHash. Exact + Jaccard + MinHash use md5-derived
  * hashes so a SQL oracle reproduces them bit-for-bit; all are
  * shuffle-on-key plans (no global sort, no driver loops).
  */
object DedupDocs {

  /** Exact dedup by content hash (keep-first = min doc_id).
    * One shuffle on the md5 key; at 100 TB this is the classic
    * hash-groupBy dedup with map-side partial aggregation. */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Cross-document duplicated-span detection, the Spark-native reduction
    * of exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): a token k-gram occurring
    * more than once in the corpus (any document, including twice in the
    * same one) marks its k token positions as duplicated; each document
    * reports how much of it is covered by such spans. Overlapping and
    * adjacent duplicated grams merge into maximal-span coverage (a fold
    * over the sorted dup starts — min(k, gap) per start) — the same
    * quantity a suffix-array pass would report, computed with joins and
    * aggregates instead of a single-node suffix array.
    *
    * Output: (doc_id, n_tokens, n_dup_starts, n_covered, dup_frac) for
    * EVERY document — zero rows matter, they are the clean majority.
    *
    * Physical plan (the 100 TB shape): the gram-frequency aggregate is
    * the one big exchange and it map-side combines (the exchange carries
    * distinct grams, not occurrences); duplicated grams are the tiny
    * minority, so the semi-join back onto positions keeps O(dup starts)
    * rows, and the coverage explode is k× that — everything after the
    * first aggregate is sized by the duplication rate, not the corpus. */
  def dupSpans(documents: DataFrame, k: Int): DataFrame =
    // gram identity = 16-byte two-seed xxHash64 pair per position
    // ([[graft.functions.GramXxPair]] — zero-copy byte-range hashes):
    // no per-position slice/concat_ws string build, fixed-width
    // exchange keys, and no MessageDigest per-call overhead — which,
    // not the MD5 block math, dominated the digest cost (DupSpansBench
    // A/B, COVERAGE r11). The MD5 form is retained as [[dupSpansMd5]]
    // and the string-gram form as [[dupSpansHof]] (what the SQL oracle
    // spells); LmRedactDupSpansSpec pins all three equal.
    dupSpansFrom(documents, xxPairPositions(documents, k), k)

  /** [[dupSpans]] with the 16-byte-MD5 gram identity — the pre-r11
    * formulation, retained as the equivalence baseline and for callers
    * that want a cryptographic gram key. */
  private[graft] def dupSpansMd5(documents: DataFrame, k: Int): DataFrame =
    dupSpansFrom(documents, md5Positions(documents, k), k)

  /** (doc_id, pos, gram) with the 16-byte [[GramXxPair]] identity. */
  private def xxPairPositions(documents: DataFrame, k: Int): DataFrame =
    documents.select(
      col("doc_id"),
      posexplode(graft.functions.GramXxPair.gramXxPair(col("text"), k)).as(Seq("pos", "gram"))
    )

  /** (doc_id, pos, gram) with the 16-byte MD5 gram digest. */
  private def md5Positions(documents: DataFrame, k: Int): DataFrame =
    documents.select(
      col("doc_id"),
      posexplode(graft.functions.GramHashes.gramHashes(col("text"), k)).as(Seq("pos", "gram"))
    )

  /** The string-gram formulation of [[dupSpans]] — what the SQL oracle
    * spells. Kept for the equivalence spec. */
  private[graft] def dupSpansHof(documents: DataFrame, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = when(
      size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))
      )
    ).otherwise(array().cast("array<string>"))
    val pos = documents.select(col("doc_id"), posexplode(grams).as(Seq("pos", "gram")))
    dupSpansFrom(documents, pos, k)
  }

  /** Shared tail of the dup-span forms: gram-frequency aggregate →
    * semi-join → per-doc fold. `gram` is any faithful identity column
    * (xx-pair binary, MD5 binary, or the HOF gram string). */
  private def dupSpansFrom(documents: DataFrame, pos: DataFrame, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val dupGrams = pos.groupBy("gram").agg(count(lit(1)).as("occ")).where(col("occ") > 1)
    val dupStarts = pos.join(dupGrams.select("gram"), Seq("gram"), "left_semi")
    // Covered tokens = union length of the [start, start+k) intervals.
    // For per-doc SORTED starts that is a fold — each start past the
    // first contributes min(k, gap to its predecessor) — so ONE per-doc
    // aggregate replaces an interval explode + corpus-wide DISTINCT,
    // and the gram-frequency subtree is built once, not once per
    // consumer. collect_list is bounded by per-doc dup starts (≤ doc
    // tokens; [[graft.ops.Text.chunkDocs]] is the long-doc guard).
    // Native fold (r19): the interpreted aggregate() lambda ran per
    // start per doc; [[graft.functions.CoveredLen]] is the identical
    // arithmetic in one pass (SpanKernelsSpec A/B-pinned).
    val covered = graft.functions.CoveredLen.coveredLen(
      sort_array(collect_list(col("pos"))), k)
    val perDoc = dupStarts
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_starts"), covered.as("n_covered"))
    documents
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        round(coalesce(col("n_covered"), lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("dup_frac")
      )
  }

  /** Exact-substring span REMOVAL — the remediation counterpart of
    * [[dupSpans]] (the RefinedWeb/Gopher pipeline step: don't just
    * MEASURE duplicated substrings, strip them): every token covered by
    * a duplicated k-gram (a gram occurring more than once corpus-wide —
    * the [[dupSpans]] contract, including twice in one document) is
    * dropped, and the survivors are rejoined in token order.
    *
    * Output: (doc_id, text_clean, n_tokens, n_removed) for EVERY
    * document — clean docs pass through with n_removed = 0, fully
    * duplicated docs come back with text_clean = "".
    *
    * Physical plan (the 100 TB shape): the gram-frequency subtree is
    * [[dupSpans]]' — kernel gram identities, one O(gram-occurrence)
    * exchange on two flat long keys, dup starts collapsed to ONE row
    * per AFFECTED doc.
    * That per-affected-doc starts frame joins back onto the corpus; when
    * the doc count bounds it under the broadcast threshold the corpus
    * text never shuffles (the [[Decontaminate]] shape). The gate is the
    * CHEAP conservative bound — total doc count × per-row estimate, one
    * parquet-metadata job — rather than a count of the starts frame
    * itself, which would either re-execute the whole gram aggregate (the
    * double-consumed-subtree trap, COVERAGE.md r8) or pin a persisted
    * copy with no release point (the Mixture advisory). Oversized
    * corpora degrade to one shuffled join — for a text-rewriting op that
    * floor is inherent; run it AFTER doc-level dedup, which removes the
    * mass duplicates that would inflate the starts side.
    *
    * The kept-token projection folds token index × per-doc dup starts —
    * O(doc length × starts per doc), bounded like the [[dupSpansFrom]]
    * coverage fold, with [[graft.ops.Text.chunkDocs]] as the long-doc
    * guard.
    */
  def stripDupSpans(
      documents: DataFrame,
      k: Int,
      sizeHint: Option[(Long, Long)] = None
  ): DataFrame =
    // xx-pair gram identity, same rationale as [[dupSpans]]
    stripDupSpansFrom(documents, xxPairPositions(documents, k), k, sizeHint)

  /** [[stripDupSpans]] with the 16-byte-MD5 gram identity — retained as
    * the equivalence baseline (LmRedactDupSpansSpec). */
  private[graft] def stripDupSpansMd5(
      documents: DataFrame,
      k: Int,
      sizeHint: Option[(Long, Long)] = None
  ): DataFrame =
    stripDupSpansFrom(documents, md5Positions(documents, k), k, sizeHint)

  /** The string-gram formulation of [[stripDupSpans]] — what the SQL
    * oracle spells. Kept for the equivalence spec. */
  private[graft] def stripDupSpansHof(
      documents: DataFrame,
      k: Int,
      sizeHint: Option[(Long, Long)] = None
  ): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = when(
      size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))
      )
    ).otherwise(array().cast("array<string>"))
    val pos = documents.select(col("doc_id"), posexplode(grams).as(Seq("pos", "gram")))
    stripDupSpansFrom(documents, pos, k, sizeHint)
  }

  private def stripDupSpansFrom(
      documents: DataFrame,
      pos: DataFrame,
      k: Int,
      sizeHint: Option[(Long, Long)]
  ): DataFrame = {
    val dupGrams = pos.groupBy("gram").agg(count(lit(1)).as("occ")).where(col("occ") > 1)
    val starts = pos
      .join(dupGrams.select("gram"), Seq("gram"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    // BYTE-bounded broadcast gate (r9 advisory): the starts frame has
    // ≤ one row per doc, but its `__starts` array<int> is variable
    // length — a heavily duplicated corpus can carry thousands of
    // starts per row, so a generic per-row allowance can under-count
    // 10–100× and defeat the OOM guard broadcastIfSmall exists for.
    // Sound bound with NO execution of the gram subtree: dup starts ⊆
    // gram positions ⊆ token positions, and n_tokens per doc is exactly
    // spaces+1 — so one (count, Σ n_tokens) aggregate (a single
    // text-column scan, bounded next to this op's own ≥2 text passes)
    // caps the broadcast at 48 B/row + 4 B/token (UnsafeArrayData packs
    // the no-null int starts at 4 B each; the row overhead term is
    // generous). Still pessimistic on mostly-unique corpora — dup
    // starts are usually far under the all-tokens bound — but the only
    // tighter number requires executing the gram aggregate (the
    // double-execution trap). Callers with a
    // pre-transformed input (e.g. [[graft.ops.Text.chunkDocs]] output,
    // where even the count() is no longer a metadata job) pass
    // `sizeHint = (docCount, tokenCount)` — the peakCountHint pattern —
    // and the job is skipped; an UNDERSTATED hint defeats the guard.
    val thr = documents.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val (nDocs, totalTokens) = sizeHint.getOrElse {
      // SHORT-CIRCUIT: the exact token-sum needs a text-column scan,
      // but the 48 B/row floor alone often already rules broadcast out
      // (or broadcasting is disabled) — a metadata-only count decides
      // that for free, and the stats scan runs only when the floor
      // passes and the token sum could still tip the verdict.
      val nd = documents.count()
      if (thr <= 0 || nd * 48L > thr) (nd, Long.MaxValue / 16L)
      else {
        val r = documents
          .agg(
            count(lit(1)),
            coalesce(
              sum((length(col("text")) - length(regexp_replace(col("text"), " ", ""))
                + lit(1)).cast("long")),
              lit(0L)))
          .first()
        (r.getLong(0), r.getLong(1))
      }
    }
    val startsBytes = nDocs * 48L + 4L * totalTokens
    val gated = if (thr > 0 && startsBytes <= thr) broadcast(starts) else starts
    // native rebuild (r19): the HOF spelling evaluated an interpreted
    // `exists` over the starts per TOKEN — O(tokens × starts) lambda
    // calls per doc; [[graft.functions.StripTokens]] is one byte pass
    // with the identical split/rejoin and null algebra
    // (SpanKernelsSpec A/B-pinned).
    val res = graft.functions.StripTokens.stripTokens(
      col("text"), col("__starts"), k, " ")
    documents
      .join(gated, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        res.getField("text_clean").as("text_clean"),
        res.getField("n_tokens").as("n_tokens"),
        res.getField("n_removed").as("n_removed")
      )
  }

  /** Canonical selection per dup-cluster: given cluster assignments
    * ([[connectedComponents]] output) and a per-doc score, keep the
    * HIGHEST-scoring member of each cluster (ties → smallest doc_id) —
    * the curation refinement over keep-first dedup: near-dup clusters
    * mix a clean original with truncated/boilerplate-wrapped copies,
    * and keep-first picks whichever has the smallest id. One window
    * sort per cluster partition (clusters are near-dup groups — tiny
    * fan-in, embarrassingly parallel across clusters). Emits every doc
    * with its cluster and a `keep` verdict, so downstream stages can
    * filter or audit. */
  def canonicalPerCluster(
      clusters: DataFrame,
      scores: DataFrame,
      scoreCol: String
  ): DataFrame = {
    // LEFT join: an inner join would silently DROP cluster members
    // missing from the scores frame (scores computed on a filtered or
    // sampled slice), losing their audit rows and possibly crowning the
    // wrong canonical. Unscored members rank BELOW every scored one
    // (−∞ sentinel), ties still break keep-first on doc_id — an
    // all-unscored cluster degrades to plain keep-first.
    val w = Window
      .partitionBy(col("cluster_id"))
      .orderBy(
        coalesce(col(scoreCol), lit(Double.NegativeInfinity)).desc,
        col("doc_id").asc)
    clusters
      .join(scores.select(col("doc_id"), col(scoreCol)), Seq("doc_id"), "left")
      .withColumn("pick_rank", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), (col("pick_rank") === 1).as("keep"))
  }

  /** LINE-level dedup — the RefinedWeb/Falcon curation step the span
    * forms don't cover: a LINE (delimiter-split unit — newline for web
    * text) whose exact text occurs in at least `minDocs` DISTINCT
    * documents is boilerplate (nav bars, cookie banners, footers) and
    * is removed from EVERY document, with survivors rejoined in line
    * order. Differs from [[stripDupSpans]] on all three axes that
    * matter: the unit is a whole line (not a token k-gram), the
    * threshold counts DISTINCT DOCUMENTS (a line repeated within one
    * document is not boilerplate), and removal applies to all
    * occurrences including the first.
    *
    * Output: (doc_id, text_clean, n_lines, n_removed) for EVERY
    * document.
    *
    * Physical plan (the 100 TB shape): one exchange — the per-line
    * distinct-doc count (line occurrences are collapsed to one row per
    * (doc, line) IN the kernel-side projection via array_distinct
    * before the count, so the exchange carries distinct pairs);
    * flagged lines semi-join back (AQE broadcasts the boilerplate
    * minority) and one per-doc fold collects removal indices. Line
    * identity crosses the wire as a 16-byte xxhash64 PAIR (the
    * [[graft.functions.GramXxPair]] identity standard — two independent
    * 64-bit hashes, collision odds 2⁻¹²⁸-scale), so no line string ever
    * enters an exchange regardless of line length; survivors are
    * rejoined from the document's own line array, which never moves.
    * Measured 14.4 → 9.6 s at 100× vs string-keyed exchanges.
    */
  def stripDupLines(
      documents: DataFrame,
      minDocs: Int = 2,
      delim: String = "\n"
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = split(col("text"), java.util.regex.Pattern.quote(delim), -1)
    val occ = documents
      .select(col("doc_id"), posexplode(lines).as(Seq("ln", "line")))
      .select(
        col("doc_id"),
        col("ln"),
        struct(xxhash64(col("line")), xxhash64(col("line"), lit(1L))).as("lk")
      )
    // distinct docs per line WITHOUT countDistinct's two-phase expand:
    // collapse to distinct (doc, line-key) first (map-side combinable),
    // then a plain count — one logical exchange chain on the line key
    val dupLines = occ
      .select("doc_id", "lk")
      .distinct()
      .groupBy("lk")
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs)
      .select("lk")
    val removals = occ
      .join(dupLines, Seq("lk"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("ln"))).as("__rm"))
    val rm = coalesce(col("__rm"), array().cast("array<int>"))
    // native rebuild (r19): removal-by-index is exactly the
    // [[graft.functions.StripTokens]] sweep at k = 1 with the line
    // delimiter as separator — the HOF spelling paid an interpreted
    // array_contains per LINE. n_removed keeps its own spelling
    // (size of the removal list — same value, but null text maps to 0
    // here where the spans form yields null).
    val res = graft.functions.StripTokens.stripTokens(
      col("text"), col("__rm"), 1, delim)
    documents
      .join(removals, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        res.getField("text_clean").as("text_clean"),
        res.getField("n_tokens").as("n_lines"),
        size(rm).cast("long").as("n_removed")
      )
  }

  /** Word k-shingles, distinct per doc; `carry` columns ride along.
    * Documents with fewer than k tokens contribute NO shingles (matching
    * DuckDB's empty generate_series). One native kernel call per document
    * ([[graft.functions.ShingleArray]] — zero-copy byte-range shingles,
    * in-pass dedup) instead of the split/transform/slice/concat_ws/
    * array_distinct chain; ShingleArraySpec pins bit-for-bit equality
    * with that formulation (kept below as [[shinglesHof]]). */
  def shingles(documents: DataFrame, k: Int, carry: Seq[String] = Nil): DataFrame =
    documents
      .select(
        (Seq(col("doc_id")) ++ carry.map(col) :+
          explode(graft.functions.ShingleArray.shingleArray(col("text"), k)).as("shingle")): _*
      )

  /** The HOF formulation [[shingles]] replaced — what the DuckDB oracle
    * spells. Kept for the equivalence spec. */
  private[graft] def shinglesHof(documents: DataFrame, k: Int, carry: Seq[String] = Nil): DataFrame =
    documents
      .select((Seq(col("doc_id")) ++ carry.map(col) :+ split(col("text"), " ").as("toks")): _*)
      .select(
        (Seq(col("doc_id")) ++ carry.map(col) :+
          explode(
            array_distinct(
              when(
                size(col("toks")) >= k,
                transform(
                  sequence(lit(0), size(col("toks")) - k),
                  i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))
                )
              ).otherwise(array().cast("array<string>"))
            )
          ).as("shingle")): _*
      )

  /** Within-bucket ordered pair generation: given a `docs` array column
    * (sorted ascending, distinct), emit one row per (doc_a, doc_b) with
    * doc_a < doc_b. Streams through two generators (posexplode + explode
    * over a slice) rather than materializing the m² pair array, so a
    * skewed bucket costs rows, not task memory. */
  private[graft] def explodePairs(buckets: DataFrame): DataFrame =
    buckets
      .select(posexplode(col("docs")).as(Seq("i", "doc_a")), col("docs"))
      .select(
        col("doc_a"),
        explode(slice(col("docs"), col("i") + 2, size(col("docs")))).as("doc_b")
      )

  /** Star pairs: bucket head vs every other member — O(m) rows instead of
    * O(m²), with the SAME transitive closure (the star keeps the bucket
    * connected). The right shape when pairs feed CLUSTERING: a bucket of
    * 1M boilerplate copies yields 10⁶ star edges instead of 5·10¹¹
    * pairs. Not a substitute when the pair LIST itself is the product.
    * Cost: within a bucket, non-head members sit at distance 2 instead
    * of 1, so a component's diameter — and min-label propagation's round
    * count — can double; [[connectedComponents]]' default `maxIters`
    * leaves headroom for that. */
  private[graft] def explodeStarPairs(buckets: DataFrame): DataFrame =
    buckets
      .select(
        element_at(col("docs"), 1).as("doc_a"),
        explode(slice(col("docs"), lit(2), size(col("docs")))).as("doc_b")
      )

  /** Exact pairwise n-gram Jaccard similarity >= threshold, blocked by a
    * `blockCol` (e.g. source) to bound the candidate space — the standard
    * blocking trick that keeps the pair join linear-ish instead of n².
    * Pairs are emitted once (doc_a < doc_b).
    *
    * Physical plan: the pair intersections come from ONE
    * (block, shingle) bucket aggregate; the per-doc shingle counts come
    * from the DOC SIDE — `size(shingle_array(text, k))` is the distinct
    * shingle count (ShingleArray dedupes), so the denominator needs no
    * shuffle at all and the expensive variable-width collect_list merge
    * runs for exactly one consumer (profiling at 100× showed the old
    * buckets→explode→count sizes branch re-running the full bucket
    * aggregate: two of the three ~10 s jobs were the same merge twice).
    * Ultra-frequent shingles are the skew axis at scale — buckets stream
    * their pairs (see [[explodePairs]]), and `maxDocFreq` is the 100 TB
    * knob: shingles appearing in more than that many documents of a
    * block (stopword n-grams — no dedup signal, quadratic pair cost) are
    * DROPPED FROM THE SHINGLE UNIVERSE, bounding every bucket's fan-out.
    * With a cap, the doc-side count is corrected by each doc's dropped
    * (hot) shingles — exploded from the few over-cap buckets only — so
    * the Jaccard stays internally consistent (similarity over the
    * reduced universe), and boilerplate stops diluting the denominator:
    * on a boilerplate-injected 100× corpus the capped run reports a
    * SUPERSET of the uncapped pairs (measured, NgramCapBench — recall
    * 1.0 plus recovered content pairs). Default None = exact over all
    * shingles. */
  def ngramJaccardPairs(
      documents: DataFrame,
      k: Int,
      threshold: Double,
      blockCol: String,
      maxDocFreq: Option[Int] = None
  ): DataFrame = {
    // a cap below 2 silently drops every pair-capable bucket — reject it
    maxDocFreq.foreach(cap => require(cap >= 2, s"maxDocFreq must be >= 2, got $cap"))
    // NULL blocks join to nothing under equi-join semantics (and in the
    // SQL oracle); drop them before bucketing, or they would collapse
    // into one giant NULL bucket
    val base = documents.where(col(blockCol).isNotNull)
    val sh = shingles(base, k, carry = Seq(blockCol))
    // doc-frequency per shingle via an unordered window over the SAME
    // (block, shingle) exchange the bucket aggregate needs: singleton
    // shingles (the vast majority — 78% of the 100× corpus's buckets)
    // are filtered BEFORE the variable-width collect_list ever sees
    // them, and the over-cap branch needs no list merge at all
    val byShingle = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol), col("shingle"))
    val withDf = sh.withColumn("__df", count(lit(1)).over(byShingle))
    val pairable = maxDocFreq
      .fold(withDf.where(col("__df") > 1))(cap =>
        withDf.where(col("__df") > 1 && col("__df") <= cap))
    val buckets = pairable
      .groupBy(col(blockCol), col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
    // n_sh per doc, DOC-SIDE: ShingleArray already dedupes, so the array
    // size IS the distinct-shingle count — no second consumption of the
    // bucket aggregate, no shuffle for the denominator
    val docCounts = base
      .select(
        col("doc_id"),
        size(graft.functions.ShingleArray.shingleArray(col("text"), k)).cast("long").as("n_sh"))
      .where(col("n_sh") > 0)
    val sizes = maxDocFreq.fold(docCounts) { cap =>
      // capped universe: subtract each doc's dropped (over-cap) shingles.
      // This re-runs the doc-freq window for the dropped branch — the
      // measured-best shape: the tempting count-agg + semi-join variant
      // re-shuffles the full shingle stream in its map stage before AQE
      // can shrink the join (measured 34% slower at 100×), whereas the
      // window recompute at least reuses one exchange's worth of work
      // per consumer and the over-cap filter drops almost everything
      // before the per-doc count
      val droppedPerDoc = withDf
        .where(col("__df") > cap)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("__n_dropped"))
      docCounts
        .join(droppedPerDoc, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          (col("n_sh") - coalesce(col("__n_dropped"), lit(0L))).as("n_sh"))
        .where(col("n_sh") > 0)
    }
    val inter = explodePairs(buckets)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn(
        "jaccard",
        round(
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"),
          4
        )
      )
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Broder CONTAINMENT near-dup pairs — the metric Jaccard misses: a
    * short document wholly quoted inside a long one has tiny Jaccard
    * (union is dominated by the long side) but containment
    * |A∩B| / min(|A|, |B|) ≈ 1. The wrapper/quote/boilerplate-insert
    * duplication class in web corpora is exactly this shape. Same
    * blocked exact plumbing as [[ngramJaccardPairs]] (one
    * (block, shingle) exchange, singleton shingles shed pre-collect);
    * emits both metrics so a reviewer sees WHY the pair surfaced.
    * Scale contract identical to the Jaccard form: exact within blocks;
    * MinHash-LSH is the unblocked 100 TB screen. */
  def ngramContainmentPairs(
      documents: DataFrame,
      k: Int,
      threshold: Double,
      blockCol: String
  ): DataFrame = {
    // (no maxDocFreq knob here: a capped shingle universe would need the
    // Jaccard form's dropped-shingle size adjustment to stay an honest
    // denominator — use ngramJaccardPairs when capping)
    val base = documents.where(col(blockCol).isNotNull)
    val sh = shingles(base, k, carry = Seq(blockCol))
    val byShingle = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol), col("shingle"))
    val withDf = sh.withColumn("__df", count(lit(1)).over(byShingle))
    val pairable = withDf.where(col("__df") > 1)
    val buckets = pairable
      .groupBy(col(blockCol), col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
    val sizes = base
      .select(
        col("doc_id"),
        size(graft.functions.ShingleArray.shingleArray(col("text"), k)).cast("long").as("n_sh"))
      .where(col("n_sh") > 0)
    explodePairs(buckets)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn(
        "containment",
        round(col("n_inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"), 4))
      .withColumn(
        "jaccard",
        round(
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"),
          4))
      .where(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum hash
    * over the doc's shingles. ONE md5 per shingle; the seed family is the
    * double-hashing combination `h_s = (h1 mod p + s·(h2 mod p)) mod p`,
    * p = 1e9+7, of the two md5 halves — 16× fewer digests than hashing
    * (seed, shingle) pairs, still byte-reproducible by the SQL oracle.
    * The OUTER mod is what makes the seeds independent in practice: the
    * unreduced form `h1 + s·h2` (shipped through r8) left the 60-bit h1
    * dominant, every seed's argmin was the same min-h1 shingle, and the
    * signature carried the variance of ONE hash — match counts between
    * any candidate pair were exactly 0 or numHashes, never partial
    * (measured in r9 on random corpora), which nullified both the LSH
    * band S-curve and any estimated-Jaccard verification. The
    * per-(doc, seed) min is computed with `numHashes` min-aggregates
    * over an array column (no row explosion), then unpivoted. */
  /** Wide per-doc signature: one row per doc with columns m0..m{n-1}.
    * One native kernel call per document ([[graft.functions.MinHashSig]]
    * — the whole shingle→md5→min pipeline in a single byte pass), so no
    * shingle explode and no numHashes-column aggregate exist in the plan
    * at all. Docs with < k tokens have no shingles and drop out, exactly
    * like the groupBy over zero exploded rows they produced before. */
  private def wideSignatures(documents: DataFrame, k: Int, numHashes: Int): DataFrame =
    documents
      .select(
        col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("text"), k, numHashes).as("__ms")
      )
      .where(col("__ms").isNotNull)
      .select(
        col("doc_id") +:
          (0 until numHashes).map(s => col("__ms").getItem(s).as(s"m$s")): _*
      )

  /** The HOF/SQL formulation [[wideSignatures]] replaced — what the
    * DuckDB oracle spells. Kept for the bit-for-bit equivalence spec
    * (MinHashSigSpec). */
  private[graft] def wideSignaturesHof(documents: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val hashed = shingles(documents, k)
      .withColumn("__md5", md5(col("shingle").cast("binary")))
      .withColumn("h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("__md5"), 17, 15), 16, 10).cast("long") % 1000000007L)
    val minCols = (0 until numHashes).map { s =>
      min((col("h1") % 1000000007L + lit(s.toLong) * col("h2")) % 1000000007L).as(s"m$s")
    }
    hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  def minhashSignatures(documents: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val agg = wideSignatures(documents, k, numHashes)
    val stacked = (0 until numHashes)
      .map(s => s"$s, m$s")
      .mkString(", ")
    agg.selectExpr("doc_id", s"stack($numHashes, $stacked) AS (seed, minhash)")
  }

  /** MinHash-LSH candidate pairs: band the signature (`numHashes` rows into
    * bands of `rowsPerBand`), bucket on (band, band-hash), emit distinct
    * candidate pairs. The banding bucket is the scale path: no n²
    * comparison ever materializes, and the signature pipeline
    * (tokenize → shingle → md5 → min-agg) runs exactly ONCE — pairs come
    * from grouping the bucket membership, not from a self-join that would
    * recompute the whole subtree per side.
    *
    * `star = true` emits bucket-head-vs-rest STAR edges instead of all
    * within-bucket pairs: O(members) instead of O(members²) per bucket,
    * with the same connected components — use it when the pairs feed
    * [[connectedComponents]]; at 100 TB one mass-duplicated boilerplate
    * bucket makes the quadratic form intractable and the star form
    * linear. */
  /** Per-doc LSH band keys `(doc_id, band, band_key)` — the row unit an
    * incremental pipeline PERSISTS as its corpus index (see
    * [[IncrementalDedup]]). Band keys "s0:h0,s1:h1,..." (seed order —
    * byte-identical to the SQL oracle) are built DIRECTLY from the wide
    * signature row: no unpivot, no per-(doc,band) re-aggregation
    * shuffle. Docs with < k tokens have no shingles, hence no rows. */
  def bandKeys(
      documents: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame =
    bandKeysWithSig(documents, k, numHashes, rowsPerBand)
      .select("doc_id", "band", "band_key") // sig array pruned by Catalyst

  /** [[bandKeys]] plus the full minhash signature on every band row
    * (`sig`: numHashes longs, ~128 bytes at the default 16 — still tiny
    * vs the payload the index exists to avoid). Carrying the signature
    * lets an incremental screen VERIFY a band collision's estimated
    * Jaccard before flagging ([[IncrementalDedup.screenVerified]])
    * instead of treating any single-band collision as a dup verdict. */
  def bandKeysWithSig(
      documents: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    // NOTE: exact banding only — a partial trailing band would inflate
    // candidate recall unpredictably; pad numHashes instead
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      val key = concat_ws(
        ",",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map { s =>
          concat_ws(":", lit(s.toString), col(s"m$s"))
        }: _*
      )
      struct(lit(b).as("band"), key.as("band_key"))
    }
    val sig = array((0 until numHashes).map(s => col(s"m$s")): _*)
    wideSignatures(documents, k, numHashes)
      .select(col("doc_id"), sig.as("sig"), explode(array(bandStructs: _*)).as("bk"))
      .select(
        col("doc_id"),
        col("bk.band").as("band"),
        col("bk.band_key").as("band_key"),
        col("sig"))
  }

  /** Per-source exact-duplication report — the monitoring number a
    * curation dashboard tracks per ingest: how much of each source is
    * verbatim copies. Distinct-ness is counted over the 128-bit content
    * digest, not the text itself, so the distinct aggregation exchanges
    * 32-byte hashes instead of documents (the line-dedup hash-pair
    * lesson). One aggregate, map-side combinable. */
  def dupRateBySource(documents: DataFrame, sourceCol: String = "source"): DataFrame =
    documents
      .select(col(sourceCol), md5(col("text")).as("__h"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__h")).as("n_unique"))
      .withColumn(
        "dup_rate",
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs").cast("double"), 4))

  /** Cross-source duplicate-leakage matrix: MinHash-LSH near-dup pairs
    * rolled up to (source, source) counts — the report that tells a
    * mixture designer which sources copy from each other (and how much
    * of a source is boilerplate shared with another) before weights are
    * chosen. The pair set is persisted slim (two longs/row) between the
    * broadcast-gate count and the final rollup — the repeated-subtree
    * rule: without it the whole LSH pipeline runs twice. Pairs then
    * broadcast onto the (doc_id, source) projection, so the corpus
    * never shuffles for the lookup; source pairs are normalized
    * (least/greatest) so the matrix is upper-triangular. */
  def sourceOverlapMatrix(
      documents: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int,
      sourceCol: String = "source"
  ): DataFrame = {
    val pairsRaw = minhashLshPairs(documents, k, numHashes, rowsPerBand)
    // The pair set is referenced by the returned plan AND needed for the
    // broadcast-gate count — the repeated-subtree rule says don't run
    // the LSH pipeline twice. Shared limit-probe recipe
    // ([[graft.util.DriverSide]]): local relation in the common tiny-
    // pair-set case (nothing stays persisted), CacheRegistry-tracked
    // persist for a huge pair set.
    val p = graft.util.DriverSide.smallSideOrTracked(pairsRaw)
    val src = documents.select(col("doc_id"), col(sourceCol))
    p.join(src.select(col("doc_id").as("doc_a"), col(sourceCol).as("__sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col(sourceCol).as("__sb")), "doc_b")
      .select(
        least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  def minhashLshPairs(
      documents: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int,
      star: Boolean = false
  ): DataFrame = {
    val sig = bandKeys(documents, k, numHashes, rowsPerBand)
    val buckets = sig
      .groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .where(size(col("docs")) > 1)
    (if (star) explodeStarPairs(buckets) else explodePairs(buckets)).distinct()
  }

  /** SimHash near-duplicate pairs: band the 64-bit simhash into four
    * 16-bit keys (two docs within Hamming distance 3 must agree on at
    * least one band — pigeonhole), bucket on (band, key), then keep
    * candidate pairs with exact `bit_count(a XOR b) <= maxHamming`.
    * Same compute-once bucket shape as the MinHash path: no n² pair set,
    * hashes travel with the bucket membership so no join-back. */
  def simhashNearDupPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(documents)
    val banded = sig.select(
      col("doc_id"),
      col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("simhash"), 16 * b).bitwiseAND(65535L).as("band_key")
        )
      }: _*)).as("bk")
    )
    val buckets = banded
      .groupBy(col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("docs"))
      .where(size(col("docs")) > 1)
    // explodePairs is element-type-generic: here the members are
    // (doc_id, simhash) structs, so the hashes travel with the pair
    explodePairs(buckets)
      .select(
        col("doc_a.doc_id").as("doc_a"),
        col("doc_b.doc_id").as("doc_b"),
        bit_count(col("doc_a.simhash").bitwiseXOR(col("doc_b.simhash"))).cast("long").as("hamming")
      )
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a near-dup pair set — the step that turns
    * candidate PAIRS into duplicate CLUSTERS with one canonical keeper
    * (min doc_id) each. Iterative min-label propagation WITH pointer
    * jumping: every round each doc adopts the smallest label among
    * itself and its neighbors, then jumps to that label's own label —
    * so chains collapse exponentially and the loop converges in
    * O(log component diameter) rounds (checked via an aggregate, not a
    * driver collect of the data). Deterministic: the
    * final label of every member is the component's global min doc_id,
    * independent of iteration order — which is also what a SQL
    * transitive-closure oracle computes.
    *
    * Scale: the label-propagation loop runs ONLY over docs that appear
    * in at least one pair — every other doc is a singleton component by
    * definition and joins back in a single final pass (left join +
    * coalesce, broadcast when the pair graph is small). At 100 TB the
    * near-dup graph is orders of magnitude smaller than the corpus, so
    * the N iterative shuffles touch only the small graph, never the full
    * document set. Each round is one join + one aggregate on (doc,
    * label) pairs; near-dup graphs are sparse forests of small cliques,
    * so rounds ≈ 2-4 in practice; the loop is capped and persists each
    * iteration (lineage would otherwise grow exponentially).
    *
    * When the (already docs-scoped, deduplicated) edge set fits the
    * driver — `driverEdgeLimit`, same spirit as Spark collecting a
    * broadcast join side — the components are solved in one union-find
    * pass on the driver and shipped back as a broadcast-sized label
    * table: one collect beats N shuffle rounds. The fast path only fires
    * for LongType doc ids (it unions primitive longs); any other id type
    * takes the type-agnostic distributed loop. The distributed loop also
    * remains the path for graphs beyond the limit; pass
    * `driverEdgeLimit = 0` to force it. Driver memory: the collect holds
    * ~2 longs per edge plus a HashMap entry per distinct member —
    * the 1M default is ~50 MB transient; size the limit to your driver
    * heap before raising it.
    */
  def connectedComponents(
      docs: DataFrame,
      pairs: DataFrame,
      // the distributed loop pointer-jumps, so rounds ≈ log2(component
      // diameter) + 2 — 40 covers any physically storable graph; the
      // floor is convergence-DETECTION head-room, not diameter head-room
      maxIters: Int = 40,
      driverEdgeLimit: Long = 1000000L,
      // per-round observer for the distributed loop: (round, labels
      // changed this round). Benches/specs read convergence behavior
      // through it; no-op by default.
      progress: (Int, Long) => Unit = (_, _) => ()
  ): DataFrame = {
    val spark = docs.sparkSession

    // Lineage cut for the iterative loop — see graft.util.LoopFrames.
    import graft.util.LoopFrames.{cut, cutPartitioned}

    // symmetric edge list in ONE pass over pairs (a union of two selects
    // would evaluate the upstream candidate pipeline once per branch),
    // RESTRICTED to the docs-induced subgraph: labels must never
    // propagate through — or resolve to — a doc outside `docs`, so a
    // caller clustering a SUBSET (one source, one shard) against a
    // wider pair set gets the subgraph components, not the full-graph
    // ones (two endpoint semi-joins, once, before the loop)
    val (edges, edgesRdd) = cut(
      pairs
        .select(
          explode(
            array(
              struct(col("doc_a").as("src"), col("doc_b").as("dst")),
              struct(col("doc_b").as("src"), col("doc_a").as("dst"))
            )
          ).as("e")
        )
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .join(docs.select(col("doc_id").as("src")), Seq("src"), "left_semi")
        .join(docs.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
    )
    // the count also materializes the cached edge RDD for whichever path
    // runs below
    val nEdges = edges.count()

    // the driver fast path unions primitive longs; non-long doc ids
    // (string, int, ...) take the type-agnostic distributed loop below
    val longIds = edges.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)

    val memberLabels: DataFrame =
      if (nEdges <= driverEdgeLimit && longIds) {
        // broadcast-sized graph: one union-find pass on the driver
        // (union-by-min root, path compression) replaces N shuffle
        // rounds. Root = component min by induction: every union keeps
        // the smaller root. Collect primitives straight off the cached
        // InternalRow RDD — no external-Row boxing on the wire.
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edgesRdd.map(r => (r.getLong(0), r.getLong(1))).collect().foreach {
          case (a, b) =>
            if (!parent.contains(a)) parent(a) = a
            if (!parent.contains(b)) parent(b) = b
            val ra = find(a)
            val rb = find(b)
            if (ra < rb) parent(rb) = ra
            else if (rb < ra) parent(ra) = rb
        }
        edgesRdd.unpersist(blocking = false)
        val rows = parent.keys.toSeq.map(d => (d, find(d)))
        broadcast(spark.createDataFrame(rows).toDF("doc_id", "cluster_id"))
      } else {
        // Round 1 fused with member discovery: while labels are still the
        // identity, each member's neighbor-min is just min(dst), so ONE
        // groupBy over the symmetric edges yields both the member set (src
        // covers every pair member) and the first-round labels — no separate
        // distinct materialization, no first join.
        var (labels, labelsRdd) = cut(
          edges
            .groupBy(col("src").as("doc_id"))
            .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
        )
        // The loop's STATIC side re-keyed once on the join key with the
        // layout DECLARED (LoopFrames.cutPartitioned): every round's
        // neighbor-min join then plans neither an exchange nor a sort for
        // the edge list — only the label vector moves. Pays one extra
        // O(E) exchange here; saves one per round.
        val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val (edgesByDst, edgesByDstRdd) = cutPartitioned(
          edges
            .repartition(shufflePartitions, col("dst"))
            .sortWithinPartitions("dst"),
          Seq("dst"),
          shufflePartitions
        )
        edgesByDst.count()
        // materialize the round-1 labels WHILE the edges cache is still
        // live: cut() persists lazily, so unpersisting edgesRdd first
        // would make the loop's first action recompute the entire
        // upstream pairs pipeline through the uncached lineage
        labelsRdd.count()
        edgesRdd.unpersist(blocking = false)
        // the fused groupBy above IS propagation round 1; the loop runs the
        // remaining maxIters-1 rounds (it needs at least one pass to detect
        // convergence, hence the floor on maxIters)
        require(maxIters >= 2, s"maxIters must be >= 2, got $maxIters")
        var iter = 1
        var converged = false
        while (!converged && iter < maxIters) {
          val neighborMin = edgesByDst
            .join(labels, edgesByDst("dst") === labels("doc_id"))
            .groupBy(col("src").as("doc_id"))
            .agg(min(col("cluster_id")).as("nbr_min"))
          // candidate = min(own label, neighbor labels) — plain
          // min-propagation, which alone converges in O(diameter) rounds
          val cand = labels
            .withColumnRenamed("cluster_id", "__old")
            .join(neighborMin, Seq("doc_id"), "left")
            .select(
              col("doc_id"),
              col("__old"),
              least(col("__old"), coalesce(col("nbr_min"), col("__old"))).as("__cand"))
          // POINTER JUMP: adopt the candidate label's OWN current label
          // (label values are always member doc ids, so the lookup is a
          // self-join against this round's labels). Chains halve every
          // round — convergence in O(log diameter) instead of
          // O(diameter); a 10^4-long chain closes in ~15 rounds, not
          // 10^4. Labels only ever decrease and never below the
          // component min, so the no-change fixed point is unchanged:
          // unchanged ⇒ neighbor-min fixed ⇒ (edges are symmetric)
          // labels constant per component ⇒ constant = component min.
          // the changed flag rides in the materialized frame, so convergence
          // detection and the next-labels materialization are ONE job
          val jump = labels
            .select(col("doc_id").as("__cand"), col("cluster_id").as("__jump"))
          val (next, nextRdd) = cut(
            cand
              .join(jump, Seq("__cand"), "left")
              .select(
                col("doc_id"),
                least(col("__cand"), coalesce(col("__jump"), col("__cand"))).as("cluster_id"),
                (least(col("__cand"), coalesce(col("__jump"), col("__cand"))) < col("__old"))
                  .as("__changed")
              )
          )
          // full count, NOT limit(1): CollectLimit can stop after materializing
          // only the partitions that produced a hit, and unpersisting the
          // predecessor below would then force later iterations to recompute
          // the rest through a chain of unpersisted parents
          val changed = next.where(col("__changed")).count()
          progress(iter, changed)
          labelsRdd.unpersist(blocking = false)
          labels = next.select("doc_id", "cluster_id")
          labelsRdd = nextRdd
          converged = changed == 0
          iter += 1
        }
        edgesByDstRdd.unpersist(blocking = false)
        // fail LOUDLY: a component with diameter > maxIters would otherwise
        // silently return partially-propagated labels
        require(converged, s"connected components did not converge in $maxIters rounds — raise maxIters")
        labels
      }

    // singletons (docs in no pair) never entered either path: label = own id
    docs
      .join(memberLabels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** 64-bit SimHash over word tokens: per bit position, sum +1/-1 weighted
    * by token-hash bit, sign → bit. md5-derived token hash (first 16 hex
    * chars as unsigned-ish long via two 8-hex halves).
    *
    * The per-bit signed sums are NOT 64 separate agg columns: each token's
    * 64 bits are packed as popcount LANES — 4 bits per agg column, each
    * lane 15 bits wide (shifts 0/15/30/45) — so the aggregate updates 16
    * long buffers per row instead of 64 branchy `when` sums (~30% faster
    * end-to-end at sf0.1). The signed sum is recovered as
    * `s_b = 2·c_b − n` (c_b = per-bit set count, n = token count); the
    * sign test `s_b > 0 ⟺ 2·c_b > n` is exact, so the emitted simhash is
    * bit-identical to the naive formulation (SigBench-verified, and the
    * oracle hashes agree).
    *
    * Packing bounds the per-doc token count at 32 767 (2^15−1, the lane
    * capacity). The bound is enforced BEFORE tokenization — per document
    * row, so an oversized doc fails with the actionable message (chunk
    * the document upstream) in every mode, before any aggregation could
    * overflow — never a wrong hash. (A post-aggregation guard would be
    * too late: beyond ~2^18 tokens the packed Long sum itself overflows
    * first, which under ANSI mode — Spark 4's default — dies as a bare
    * 'long overflow' mid-aggregation.) */
  def simhash(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        graft.functions.SimHash64.simhash64(col("text")).as("simhash")
      )
      // NULL text produced no exploded tokens → no groupBy row in the
      // formulation the oracle spells; mirror that
      .where(col("simhash").isNotNull)

  /** The packed-popcount-lane aggregate [[simhash]] replaced (itself a
    * ~30% win over 64 `when` sums in round 6) — kept for the bit-for-bit
    * equivalence spec (SimHash64Spec). Lane capacity bounds it at 32 767
    * tokens/doc; the native kernel has no such bound. */
  private[graft] def simhashHof(documents: DataFrame): DataFrame = {
    val MaxTokens = 32767 // 15-bit lane capacity
    val tok = documents
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(
        col("doc_id"),
        explode(
          when(size(col("__toks")) <= MaxTokens, col("__toks"))
            .otherwise(raise_error(lit(
              s"simhash: document exceeds $MaxTokens tokens — the packed popcount lanes " +
                "would overflow; chunk the document and combine per-chunk hashes upstream"
            )))
        ).as("tok")
      )
      .withColumn("__md5", md5(col("tok").cast("binary"))) // one digest per token
      .withColumn("th_hi", conv(substring(col("__md5"), 1, 8), 16, 10).cast("long"))
      .withColumn("th_lo", conv(substring(col("__md5"), 9, 8), 16, 10).cast("long"))
    val laneGroups = (0 until 16).map { g =>
      val packed = (0 until 4)
        .map { i =>
          val b = g * 4 + i
          val src = if (b < 32) col("th_lo") else col("th_hi")
          val shift = if (b < 32) b else b - 32
          shiftleft(shiftright(src, shift).bitwiseAND(1L), 15 * i)
        }
        .reduce(_ + _)
      sum(packed).as(s"g$g")
    }
    val agg = tok.groupBy("doc_id").agg(count(lit(1)).as("__n"), laneGroups: _*)
    val sim = (0 until 64)
      .map { b =>
        val c = shiftright(col(s"g${b / 4}"), 15 * (b % 4)).bitwiseAND(32767L)
        when(c * 2 > col("__n"), shiftleft(lit(1L), b)).otherwise(0L)
      }
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sim.as("simhash"))
  }
}
