package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation chain: each gate removes exactly the doc built to
  * trip it, and the survivors come out sampled and packed. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "secret eval question about math", "bench"), // benchmark doc
    (10L, "the quick brown fox jumps over dog", "web"), // survives everything
    (11L, "zzzzzzzzzz yyyyyyyyyy xxxxxxxxxx wwwwwwwwww", "web"), // mean word len 10 → quality gate
    (12L, "the spam the spam the spam the spam", "web"), // every bigram duplicated → repetition gate
    (13L, "intro secret eval question about math end", "web"), // 3 shared 3-grams → decontamination
    (14L, "dup content here we go now", "web"), // kept (first of the pair)
    (15L, "dup content here we go now", "web"), // exact dup → dedup gate
    (16L, "some text from excluded source", "lowsrc") // weight 0 → mixture gate
  ).toDF("doc_id", "text", "source")

  private val cfg = Curation.Config(
    maxMeanWordLen = 6.0,
    maxDup2gramFrac = 0.5,
    decontaminateK = 3,
    decontaminateMinOverlap = 3,
    weights = Map("web" -> 1.0),
    packBudget = 4
  )

  test("each gate drops its doc; survivors are packed in id order") {
    val out = Curation.curate(docs, col("source") === "bench", cfg)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 14L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_off"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off"))).toMap
    // web survivors: doc 10 (7 tokens) starts seq 0 off 0; doc 14
    // (6 tokens) starts at global offset 7 → seq 1, off 3 (budget 4)
    assert(byId(10L) == ((7L, 0L, 0L, 0L)))
    assert(byId(14L) == ((6L, 7L, 1L, 3L)))
    // narrow assignment out: payloads are a write-time join, not carried
    assert(!out.head.schema.fieldNames.contains("text"))
  }

  test("permissive config keeps every non-bench doc with weight 1.0") {
    val cfgAll = Curation.Config(weights = Map("web" -> 1.0, "lowsrc" -> 1.0))
    val kept = Curation.curate(docs, col("source") === "bench", cfgAll)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // only the exact duplicate (15) falls — dedup has no off switch
    assert(kept.toSeq == Seq(10L, 11L, 12L, 13L, 14L, 16L))
  }
}
