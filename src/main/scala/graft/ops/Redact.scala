package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex scrubbing for a training-data pipeline: replace every match of
  * a set of named patterns (PII, blocklisted terms) and report per-doc
  * match counts per pattern. This is the standard pre-training privacy
  * pass (emails / IPs / phone numbers → placeholder tokens) plus
  * dictionary scrubbing, as one embarrassingly-parallel projection:
  * NO shuffle, NO join — `regexp_replace`/`regexp_count` are codegen'd
  * built-ins, so the pass runs at scan speed and scales linearly to any
  * corpus size by construction.
  *
  * Patterns stay inside the common semantics of Java regex (Spark) and
  * RE2 (the DuckDB oracle): character classes, bounded repetition,
  * alternation and `\b` word boundaries — no backreferences, no
  * lookaround. [[PiiPatterns]] are written to that subset.
  */
object Redact {

  /** Conservative PII patterns in the Java-regex ∩ RE2 subset. The test
    * corpus is synthetic word-salad with no digits or `@`, so these are
    * exercised by [[RedactSpec]] on injected fixtures; on real crawl
    * data they are the operative set. */
  object PiiPatterns {
    val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val PhoneUs = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
    val All: Seq[(String, String, String)] = Seq(
      ("email", Email, "<EMAIL>"),
      ("ipv4", Ipv4, "<IP>"),
      ("phone", PhoneUs, "<PHONE>")
    )
  }

  /** A word-boundary alternation over literal `terms` (dictionary
    * scrubbing). Terms must be regex-safe literals — enforced, because a
    * metacharacter would silently change what gets scrubbed, and
    * `\Q…\E` quoting is Java-only (the DuckDB/RE2 oracle could not
    * mirror it). An empty term list is rejected: `\b()\b` matches the
    * empty string at every word boundary and would inject the
    * replacement throughout the text. */
  def blocklistPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "empty blocklist: \\b()\\b matches at every word boundary")
    val meta = "\\^$.|?*+()[]{}".toSet
    terms.foreach { t =>
      require(t.nonEmpty && !t.exists(meta), s"blocklist term is not a regex-safe literal: '$t'")
    }
    terms.mkString("\\b(", "|", ")\\b")
  }

  /** Apply `patterns` = (name, regex, replacement) in order; output the
    * original columns plus `redacted` (the scrubbed text) and one
    * `n_<name>` match count per pattern. Counts are taken against the
    * text as seen by that pattern (after the previous patterns applied),
    * matching the sequential-replace semantics exactly. */
  def redact(
      documents: DataFrame,
      patterns: Seq[(String, String, String)],
      textCol: String = "text"
  ): DataFrame = {
    val out = patterns.foldLeft((documents, col(textCol))) { case ((df, cur), (name, pat, repl)) =>
      val counted = df.withColumn(s"n_$name", regexp_count(cur, lit(pat)).cast("long"))
      (counted, regexp_replace(cur, pat, repl))
    }
    out._1.withColumn("redacted", out._2)
  }

  /** [[redact]] projected to the oracle-friendly shape:
    * (doc_id, n_<name>..., redacted). */
  def redactReport(
      documents: DataFrame,
      patterns: Seq[(String, String, String)],
      textCol: String = "text"
  ): DataFrame = {
    val counts: Seq[Column] = patterns.map { case (name, _, _) => col(s"n_$name") }
    redact(documents, patterns, textCol)
      .select(col("doc_id") +: counts :+ col("redacted"): _*)
  }
}
