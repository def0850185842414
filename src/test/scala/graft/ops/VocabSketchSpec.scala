package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Text.vocabSizeApprox]] honesty check: the HLL++ estimate is
  * measured against the exact count, not just trusted to its rsd. */
class VocabSketchSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Synthetic corpus: group g0 has vocab 2000, g1 has 500, with heavy
    * repetition (each token appears many times — the HLL case). */
  private def corpus() = {
    val rows = (0 until 20000).map { i =>
      val g = if (i % 4 == 0) "g1" else "g0"
      val vocab = if (g == "g1") 500 else 2000
      val toks = (0 until 10).map(j => s"tok${(i * 7 + j * 13) % vocab}_$g")
      (i.toLong, toks.mkString(" "), g)
    }
    rows.toDF("doc_id", "text", "source")
  }

  test("HLL vocab estimate lands within 3·rsd of the exact count per group") {
    val df = corpus()
    val exact = Text.vocabSize(df, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (rsd <- Seq(0.05, 0.02)) {
      val approx = Text.vocabSizeApprox(df, Seq("source"), rsd)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (g, ex) =>
        val ap = approx(g)
        val err = math.abs(ap - ex).toDouble / ex
        assert(err <= 3 * rsd, s"group $g rsd=$rsd exact=$ex approx=$ap err=$err")
      }
    }
  }

  test("exact vocabSize counts distinct tokens, not occurrences") {
    val df = Seq((1L, "a b a b c", "s"), (2L, "c d", "s")).toDF("doc_id", "text", "source")
    val got = Text.vocabSize(df, Seq("source")).collect()
    assert(got.length == 1 && got.head.getLong(1) == 4L)
  }
}
