package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CoveredLen]] / [[StripTokens]] vs the interpreted HOF spellings
  * they replaced in [[graft.ops.DedupDocs]] (r19) — the old column
  * chains restated here verbatim as the reference. */
class SpanKernelsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val rows = Seq(
    (0L, "a b c d e f", Seq(0, 3)),          // two disjoint spans
    (1L, "a b c d e f", Seq(0, 1, 2)),       // overlapping spans
    (2L, "a b", Seq.empty[Int]),             // nothing removed
    (3L, "a b", null.asInstanceOf[Seq[Int]]),// null starts = no removals
    (4L, "", Seq.empty[Int]),                // empty text = one empty token
    (5L, "a  b c ", Seq(1)),                 // double space + trailing space empties
    (6L, "ü ß x y", Seq(0)),                 // multi-byte tokens
    (7L, null.asInstanceOf[String], Seq(0)), // null text
    (8L, "a b c", Seq(10))                   // start past the end covers nothing
  ).toDF("doc_id", "text", "starts")

  private def hofStrip(k: Int) = {
    val toks = split(col("text"), " ")
    val st = coalesce(col("starts"), array().cast("array<int>"))
    val kept = filter(toks, (_, i) => !exists(st, s => i >= s && i < s + k))
    rows.select(
      col("doc_id"),
      concat_ws(" ", kept).as("text_clean"),
      size(toks).cast("long").as("n_tokens"),
      (size(toks) - size(kept)).cast("long").as("n_removed"))
  }

  private def kernelStrip(k: Int) = {
    val res = StripTokens.stripTokens(col("text"), col("starts"), k, " ")
    rows.select(
      col("doc_id"),
      res.getField("text_clean").as("text_clean"),
      res.getField("n_tokens").as("n_tokens"),
      res.getField("n_removed").as("n_removed"))
  }

  test("StripTokens == filter/exists HOF on adversarial inputs, k = 3 and k = 1") {
    for (k <- Seq(1, 3)) {
      val h = hofStrip(k).orderBy("doc_id").collect().toSeq
      val g = kernelStrip(k).orderBy("doc_id").collect().toSeq
      assert(g == h, s"k=$k")
    }
  }

  test("StripTokens with a multi-char separator == HOF over the same split") {
    val df = Seq(
      (0L, "one<>two<>three", Seq(1)),
      (1L, "<>x<>", Seq.empty[Int]),
      (2L, "plain", Seq(0))
    ).toDF("doc_id", "text", "starts")
    val lines = split(col("text"), java.util.regex.Pattern.quote("<>"), -1)
    val st = coalesce(col("starts"), array().cast("array<int>"))
    val kept = filter(lines, (_, i) => !exists(st, s => i >= s && i < s + 1))
    val h = df.select(col("doc_id"), concat_ws("<>", kept).as("tc"),
      size(lines).cast("long").as("n")).orderBy("doc_id").collect().toSeq
    val res = StripTokens.stripTokens(col("text"), col("starts"), 1, "<>")
    val g = df.select(col("doc_id"), res.getField("text_clean").as("tc"),
      res.getField("n_tokens").as("n")).orderBy("doc_id").collect().toSeq
    assert(g == h)
  }

  test("CoveredLen == interpreted fold on random ascending arrays") {
    val rnd = new scala.util.Random(11)
    val data = (0L until 200L).map { i =>
      (i, (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(100)).distinct.sorted)
    }.toDF("id", "starts")
    for (k <- Seq(1, 4, 10)) {
      val hof = data.select(col("id"), aggregate(
        col("starts"),
        struct(lit(-1).as("prev"), lit(0L).as("acc")),
        (st, s) => struct(
          s.as("prev"),
          (st.getField("acc") +
            when(st.getField("prev") < 0, lit(k))
              .otherwise(least(lit(k), s - st.getField("prev")))).as("acc")),
        st => st.getField("acc")).as("cov")).orderBy("id").collect().toSeq
      val kern = data.select(col("id"),
        CoveredLen.coveredLen(col("starts"), k).as("cov")).orderBy("id").collect().toSeq
      assert(kern == hof, s"k=$k")
    }
  }
}
