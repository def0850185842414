package graft.ops

import org.apache.spark.sql.DataFrame
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
  def qualityScores(documents: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val nStop = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(stopwords))
      .getItem(0)
      .cast("double")
    documents.select(
      col("doc_id"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 4)
        .as("mean_word_len"),
      round(nStop / nTok, 4).as("stopword_ratio"),
      round(size(array_distinct(toks)).cast("double") / nTok, 4).as("type_token_ratio")
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
}
