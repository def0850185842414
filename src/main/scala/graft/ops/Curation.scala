package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard pretraining data-prep chain
  * as ONE composable operator, the way the reference composes its spike
  * chain (G5) from A3→P5→W2→W3→W4. Stages, in pipeline order:
  *
  *  1. quality gate — stopword ratio + mean word length bounds
  *     (one [[graft.functions.TokenSetCounts]] pass);
  *  2. repetition gate — duplicated-2-gram occurrence fraction bound
  *     (one [[graft.functions.RepetitionStats]] pass);
  *  3. benchmark decontamination ([[Decontaminate.clean]]);
  *  4. exact dedup keep-first (first = min id per content md5);
  *  5. deterministic weighted mixture sampling ([[Mixture.sample]]);
  *  6. greedy sequence packing ([[Mixture.packSequences]]).
  *
  * Physical shape: stages 1–2 fuse into a single stateless projection +
  * filter over the scan (both kernels are per-row — no self-joins
  * against the stats queries); 3 is a broadcast semi-join + O(matches)
  * aggregate; 4 is the chain's one corpus-wide shuffle (on the content
  * hash); 5 is a hash filter; 6 windows per source. At 100 TB nothing
  * here materializes more than once, and only stage 4 moves the
  * surviving corpus.
  */
object Curation {

  /** Gate thresholds + mixture parameters; defaults are permissive. */
  case class Config(
      minStopwordRatio: Double = 0.0,
      maxStopwordRatio: Double = 1.0,
      minMeanWordLen: Double = 0.0,
      maxMeanWordLen: Double = Double.MaxValue,
      maxDup2gramFrac: Double = 1.0,
      stopwords: Seq[String] = Seq("the", "a"),
      decontaminateK: Int = 3,
      decontaminateMinOverlap: Int = 5,
      weights: Map[String, Double] = Map.empty,
      salt: String = "curate",
      packBudget: Int = 512
  )

  /** Stages 1+2 as one boolean Column over `text` — shared verbatim by
    * the batch and streaming forms (both kernels are per-row, so the
    * whole gate is a stateless filter). */
  private[graft] def gatePredicate(cfg: Config): Column = {
    val nTok = size(split(col("text"), " ")).cast("double")
    val nStop = graft.functions.TokenSetCounts
      .tokenSetCounts(col("text"), Seq(cfg.stopwords))
      .getItem(0)
      .cast("double")
    val rep = graft.functions.RepetitionStats.repetitionStats(col("text"), Seq(2))
    val dup2 = rep.getItem(2).cast("double") / greatest(rep.getItem(0), lit(1L)).cast("double")
    (nStop / nTok).between(cfg.minStopwordRatio, cfg.maxStopwordRatio) &&
      (length(regexp_replace(col("text"), " ", "")).cast("double") / nTok)
        .between(cfg.minMeanWordLen, cfg.maxMeanWordLen) &&
      dup2 <= cfg.maxDup2gramFrac
  }

  /** Stages 1–5 (everything but packing): the screened, sampled corpus
    * with full doc columns — the chain's reusable prefix (and what the
    * STREAMING form, [[graft.streaming.Streaming.curateStream]], mirrors
    * stage for stage; packing is a global prefix sum and stays batch). */
  def screen(documents: DataFrame, isBench: Column, cfg: Config): DataFrame = {
    // stages 1+2: one stateless kernel projection + filter — no joins,
    // no shuffle
    val gated = documents.where(gatePredicate(cfg))

    // stage 3: decontaminate the gated corpus against the UNGATED
    // benchmark slice — the eval set must be matched whole, so the bench
    // side comes from `documents`, not `gated`
    val cleaned = Decontaminate.cleanAgainst(
      gated.where(!isBench),
      documents.where(isBench),
      cfg.decontaminateK,
      cfg.decontaminateMinOverlap
    )

    // stage 4: exact dedup keep-first — the chain's one corpus shuffle
    val byContent = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val deduped = cleaned
      .withColumn("__rn", row_number().over(byContent))
      .where(col("__rn") === 1)
      .drop("__rn")

    // stage 5
    Mixture.sample(deduped, cfg.weights, cfg.salt)
  }

  /** The curated corpus's packed-sequence assignment: one row per
    * surviving document — (doc_id, source, n_tokens, start_off, seq_id,
    * seq_off). Deliberately NARROW: re-attaching text through the pack
    * window's sort measured 2× the whole chain at 100×, and a join-back
    * inside the operator re-executes stages 1–5 for the second consumer
    * — callers needing payloads join documents once at write time. */
  def curate(documents: DataFrame, isBench: Column, cfg: Config): DataFrame =
    Mixture.packSequences(
      screen(documents, isBench, cfg),
      cfg.packBudget,
      groupCols = Seq("source")
    )
}
