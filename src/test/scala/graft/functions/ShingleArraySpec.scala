package graft.functions

import graft.SparkSpec
import graft.ops.DedupDocs

/** [[ShingleArray]] against the split/slice/concat_ws/array_distinct HOF
  * chain it replaced — identical (doc, shingle) multisets and
  * first-occurrence order, including space runs, unicode, and under-k
  * docs. */
class ShingleArraySpec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[String], k: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toList).toMap // preserves per-doc emit order
    val native = canon(DedupDocs.shingles(df, k))
    val hof = canon(DedupDocs.shinglesHof(df, k))
    assert(native == hof, s"k=$k texts=${texts.map(_.take(30))}")
  }

  test("prose, space runs, unicode, exact-k and under-k") {
    compare(Seq(
      "the quick brown fox jumps over it",
      "a  b   c d",
      " leading and trailing spaces here ",
      "exactly three tokens",
      "two only",
      "",
      "数据 处理 引擎 规模 测试 在这里",
      "a b a b a b a b" // duplicate shingles collapse, first kept
    ), 3)
    compare(Seq("single token shingles a b a", "x"), 1)
  }

  test("property: random token streams agree in content and order") {
    val rnd = new scala.util.Random(4242)
    (1 to 5).foreach { _ =>
      val texts = (1 to 40).map { _ =>
        (0 until rnd.nextInt(25)).map { _ =>
          if (rnd.nextInt(6) == 0) ""
          else rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
        }.mkString(" ")
      }
      compare(texts, 1 + rnd.nextInt(4))
    }
  }

  test("dedup=false emits every occurrence in order (HOF chain minus array_distinct)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9291)
    val texts = Seq("a b a b a b", "x  y x  y", "", "solo", "数据 引擎 数据 引擎") ++
      (1 to 30).map { _ =>
        (0 until rnd.nextInt(20)).map(_ => Seq("a", "bb", "", "c")(rnd.nextInt(4))).mkString(" ")
      }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    (1 to 3).foreach { k =>
      val toks = split(col("text"), " ")
      val native = df.select(col("doc_id"),
        ShingleArray.shingleArray(col("text"), k, dedup = false).as("g"))
      val hof = df.select(col("doc_id"),
        when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
          .otherwise(array().cast("array<string>")).as("g"))
      def canon(out: org.apache.spark.sql.DataFrame) =
        out.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
      assert(canon(native) == canon(hof), s"k=$k")
    }
  }
}
