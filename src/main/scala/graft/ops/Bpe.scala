package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merges (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units")
  * plus a native segmentation kernel — the real trained-subword
  * counterpart to [[Text.regexTokenStats]]' BPE-ish regex.
  *
  * Physical plan (the 100 TB shape): training never iterates over the
  * corpus. ONE corpus scan aggregates the word-frequency dictionary
  * (map-side combinable; the exchange is O(distinct words), which grows
  * sub-linearly in corpus bytes), the dictionary is capped to the
  * `maxWords` most frequent words (deterministic tiebreak) before it is
  * collected, and the merge loop runs driver-side over that bounded
  * dict — the classic formulation, whose cost is O(merges × dict
  * symbols), independent of corpus size. Encoding is a zero-shuffle
  * narrow projection: one [[graft.functions.BpeEncode]] kernel call per
  * document with per-task word memoization; the merge list rides the
  * task closure (fine to ~64k merges — a broadcast variable is the
  * documented upgrade beyond that).
  *
  * Word boundaries are single spaces and merges never cross them (no
  * end-of-word marker — word-internal BPE), so the segmentation of a
  * document is the concatenation of its words' segmentations.
  */
object Bpe {

  /** Corpus word-frequency dictionary: (w, c). */
  def wordCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("c"))

  /** Train `numMerges` merges on the corpus word-frequency dictionary.
    * Deterministic: the dict cap orders by (count desc, word asc); each
    * iteration merges the pair with the highest weighted count, ties
    * broken by the lexicographically smallest (a, b). Returns merges in
    * rank order; training stops early when no pair occurs twice. */
  def train(
      documents: DataFrame,
      numMerges: Int,
      maxWords: Int = 1 << 16
  ): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val dict = wordCounts(documents)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // symbol lists per dict word (code points), weighted by frequency
    var words: Array[(Array[String], Long)] = dict.map { case (w, c) =>
      val syms = new Array[String](w.codePointCount(0, w.length))
      var i = 0; var n = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms(n) = new String(Character.toChars(cp)); n += 1
        i += Character.charCount(cp)
      }
      (syms, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j + 1 < syms.length) {
          val key = (syms(j), syms(j + 1))
          pairCounts.update(key, pairCounts.getOrElse(key, 0L) + c)
          j += 1
        }
      }
      var best: (String, String) = null
      var bestC = 1L // a pair must occur at least twice to be worth a merge
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val next = new Array[String](syms.length)
            var w = 0; var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                next(w) = a + b; w += 1; j += 2
              } else { next(w) = syms(j); w += 1; j += 1 }
            }
            (java.util.Arrays.copyOf(next, w), c)
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Segment every document with the trained merges:
    * (doc_id, text_bpe, n_words, n_tokens) — text_bpe is the flat
    * space-joined sub-word stream, n_tokens its length. Zero-shuffle. */
  def encode(documents: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val bpe = graft.functions.BpeEncode.bpeEncode(col("text"), merges)
    documents.select(
      col("doc_id"),
      bpe.as("text_bpe"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      size(split(bpe, " ")).cast("long").as("n_tokens")
    )
  }
}
