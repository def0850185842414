package graft.functions

import graft.SparkSpec
import graft.ops.Decontaminate
import org.apache.spark.sql.functions._

/** [[ShingleSetOverlap]] (the per-row streaming form) against the
  * join-based [[Decontaminate.overlapCountsAgainst]] — identical distinct
  * overlap counts on repeats, space runs, unicode, short docs, and random
  * corpora. */
class ShingleSetOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def compare(corpusTexts: Seq[String], benchTexts: Seq[String], k: Int): Unit = {
    val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
    val joinCounts = Decontaminate
      .overlapCountsAgainst(corpus, bench, k)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val benchShingles = graft.ops.DedupDocs
      .shingles(bench, k).select("shingle").distinct().collect().map(_.getString(0)).toSeq
    val perRow = corpus
      .select(col("doc_id"),
        ShingleSetOverlap.shingleSetOverlap(col("text"), k, benchShingles).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    corpusTexts.indices.foreach { i =>
      assert(perRow(i.toLong) == joinCounts.getOrElse(i.toLong, 0L),
        s"doc $i k=$k: perRow=${perRow(i.toLong)} join=${joinCounts.getOrElse(i.toLong, 0L)}")
    }
  }

  test("directed: repeats count once, short docs zero, unicode exact") {
    compare(
      corpusTexts = Seq(
        "alpha beta gamma delta", // 2 overlapping 3-grams
        "one two three one two three", // repeated match counts once
        "zz yy", // shorter than k
        "no overlap at all here",
        "数据 引擎 规模 测试" // unicode match
      ),
      benchTexts = Seq("alpha beta gamma delta", "one two three", "数据 引擎 规模"),
      k = 3
    )
  }

  test("property: random corpora agree with the join form for k=1..3") {
    val rnd = new scala.util.Random(55511)
    val vocab = Vector("a", "b", "cc", "", "xy", "数")
    def texts(n: Int) = (1 to n).map { _ =>
      (0 until rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    (1 to 3).foreach(k => compare(texts(60), texts(8), k))
  }
}
