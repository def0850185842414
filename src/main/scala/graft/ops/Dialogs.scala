package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation (SFT / chat) data operators — the validation and
  * flattening layer an instruction-tuning pipeline runs between raw
  * dialog capture and the tokenizer: multi-turn conversations arrive as
  * an array of (role, content) turns, and before packing
  * ([[Mixture.packSequences]]) or dedup ([[DedupDocs]]) the pipeline
  * must (a) gate malformed dialogs (wrong opening role, broken
  * alternation, empty turns, truncated endings), (b) flatten surviving
  * turns through a chat template into the training text, and (c) read
  * out per-role length statistics for curriculum/budget decisions.
  *
  * Everything here is a pure Column HOF chain (`transform` /
  * `aggregate` / `exists` / `concat_ws` over the turns array — all
  * codegen'd, no UDF, no explode): per-dialog work is a stateless
  * projection, so the operators add ZERO exchanges at any scale, and a
  * DuckDB oracle respells the same arithmetic with list lambdas. The
  * reference engine has no dialog surface; this extends the
  * LLM-pipeline family (SURVEY §2 additions).
  *
  * Turn schema: `array<struct<role: string, content: string>>`. Roles
  * are matched exactly (case-sensitive — a pipeline normalizes case
  * upstream or treats `User` ≠ `user` as the defect it is).
  */
object Dialogs {

  /** Per-dialog QA flags + counts, appended as columns:
    *   - `n_turns`, `n_user`, `n_assistant`
    *   - `starts_user`      — first turn's role is `user`
    *   - `ends_assistant`   — last turn's role is `assistant` (an
    *     SFT example must end on a supervised target)
    *   - `alternates`       — no two ADJACENT turns share a role
    *     (system prefix turns count like any other role)
    *   - `has_empty`        — any turn whose content is empty/NULL
    *   - `valid`            — all of the above and `n_turns >= 2`
    * NULL/empty turn arrays yield `n_turns = 0` and `valid = false`. */
  def validateDialogs(df: DataFrame, turnsCol: String): DataFrame = {
    val t = col(turnsCol)
    val n = coalesce(size(t), lit(0))
    val roleOf = (i: Column) => element_at(t, i).getField("role")
    val nOf = (role: String) =>
      size(filter(t, x => x.getField("role") === role))
    // zip each turn with its successor by index; the n >= 2 guard is
    // load-bearing TWICE — sequence(1, 0) would generate a DESCENDING
    // [1, 0] (Spark's sequence reverses when stop < start) and
    // element_at(t, 0) raises under ANSI
    val adjacentShare = when(n >= 2,
      exists(
        transform(sequence(lit(1), n - 1), i => roleOf(i) === roleOf(i + 1)),
        identity))
      .otherwise(lit(false))
    val hasEmpty = exists(t,
      x => x.getField("content").isNull || x.getField("content") === "")
    val startsUser = n > 0 && roleOf(lit(1)) === "user"
    val endsAssistant = n > 0 && roleOf(n) === "assistant"
    val alternates = n > 0 && !adjacentShare
    df.withColumn("n_turns", n.cast("long"))
      .withColumn("n_user", nOf("user").cast("long"))
      .withColumn("n_assistant", nOf("assistant").cast("long"))
      .withColumn("starts_user", coalesce(startsUser, lit(false)))
      .withColumn("ends_assistant", coalesce(endsAssistant, lit(false)))
      .withColumn("alternates", coalesce(alternates, lit(false)))
      .withColumn("has_empty", coalesce(hasEmpty, lit(false)))
      .withColumn("valid",
        col("starts_user") && col("ends_assistant") && col("alternates") &&
          !col("has_empty") && col("n_turns") >= 2)
  }

  /** Flatten turns through a minimal chat template:
    * `<|role|>\ncontent` per turn, turns joined by `\n`, plus a
    * trailing `\n<|end|>` — deterministic, tokenizer-agnostic, and
    * trivially re-spellable in SQL (`concat_ws` over a `transform`).
    * The template is the OPERATOR's contract; a deployment with a
    * model-specific template swaps the three literals, same plan. */
  def flattenDialog(turns: Column): Column =
    concat(
      concat_ws("\n",
        transform(turns, x =>
          concat(lit("<|"), x.getField("role"), lit("|>\n"), x.getField("content")))),
      lit("\n<|end|>"))

  /** [[validateDialogs]] → keep `valid` only → append `text`
    * ([[flattenDialog]]) and `n_chars` — the gate+flatten composite a
    * pipeline feeds to tokenization/packing. Stateless projection +
    * filter; zero exchange. */
  def flattenValid(df: DataFrame, turnsCol: String): DataFrame =
    validateDialogs(df, turnsCol)
      .where(col("valid"))
      .withColumn("text", flattenDialog(col(turnsCol)))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("starts_user", "ends_assistant", "alternates", "has_empty", "valid")

  /** Preference-pair (DPO/RLHF) QA — the gate in front of reward-model
    * and direct-preference training data: per (prompt, chosen,
    * rejected) row append
    *   - `identical`    — chosen == rejected (an unlearnable pair)
    *   - `has_empty`    — any of the three empty/NULL
    *   - `len_ratio`    — length(chosen)/length(rejected), 4dp, NULL
    *     when rejected is empty (a skewed ratio is the classic
    *     length-bias signal reward models latch onto)
    *   - `valid`        — not identical, nothing empty
    * Stateless projection — zero exchange; the corpus-level length-bias
    * readout is [[preferenceBias]]. */
  def validatePreferencePairs(
      df: DataFrame, promptCol: String, chosenCol: String, rejectedCol: String): DataFrame = {
    val c = col(chosenCol)
    val r = col(rejectedCol)
    val p = col(promptCol)
    def empty(x: Column) = x.isNull || x === ""
    df.withColumn("identical", coalesce(c === r, lit(false)))
      .withColumn("has_empty", empty(p) || empty(c) || empty(r))
      .withColumn("len_ratio",
        when(!empty(r), round(length(c).cast("double") / length(r), 4)))
      .withColumn("valid", !col("identical") && !col("has_empty"))
  }

  /** Corpus-level length-bias readout over VALID pairs: one row —
    * `(n_pairs, n_chosen_longer, chosen_longer_rate, avg_len_ratio)`.
    * A rate far from 0.5 means the preference labels are confounded
    * with length and the reward model will learn verbosity. ONE
    * map-side-combinable aggregate. */
  def preferenceBias(
      df: DataFrame, promptCol: String, chosenCol: String, rejectedCol: String): DataFrame =
    validatePreferencePairs(df, promptCol, chosenCol, rejectedCol)
      .where(col("valid"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(length(col(chosenCol)) > length(col(rejectedCol)), 1L).otherwise(0L))
          .as("n_chosen_longer"),
        round(sum(when(length(col(chosenCol)) > length(col(rejectedCol)), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("chosen_longer_rate"),
        round(avg(col("len_ratio")), 4).as("avg_len_ratio"))

  /** Per-role content-length rollup over ALL dialogs: rows
    * `(role, n_turns, total_chars, avg_chars)` — the curriculum/budget
    * readout (assistant-side mass is what an SFT run actually trains
    * on). ONE explode + map-side-combinable aggregate; the exchange is
    * bounded by the role vocabulary. */
  def roleStats(df: DataFrame, turnsCol: String): DataFrame =
    df.select(explode(col(turnsCol)).as("__t"))
      .select(
        col("__t.role").as("role"),
        coalesce(length(col("__t.content")), lit(0)).cast("long").as("__len"))
      .groupBy("role")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("__len")).as("total_chars"),
        round(sum(col("__len")).cast("double") / count(lit(1)), 4).as("avg_chars"))
}
