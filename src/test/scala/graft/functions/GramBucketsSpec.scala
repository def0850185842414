package graft.functions

import graft.SparkSpec
import graft.ops.{Dsir, QualityClassifier}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the one-byte-pass [[GramBuckets]] kernel element-for-element
  * against the expression-tree formulation the DuckDB oracles spell
  * ([[QualityClassifier.bucket]] over the [[Dsir.grams]] stream). */
class GramBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def hof(numBuckets: Int, salt: String, gramSize: Int): Column =
    transform(
      Dsir.grams(gramSize),
      t => QualityClassifier.bucket(t, numBuckets, salt))

  private def check(df: org.apache.spark.sql.DataFrame, nb: Int, salt: String): Unit =
    Seq(1, 2).foreach { gs =>
      val rows = df
        .select(
          col("text"),
          GramBuckets.gramBuckets(col("text"), nb, salt, gs).as("k"),
          hof(nb, salt, gs).as("h"))
        .collect()
      rows.foreach { r =>
        val k = if (r.isNullAt(1)) null else r.getSeq[Long](1)
        val h = if (r.isNullAt(2)) null else r.getSeq[Long](2)
        assert(k == h, s"gramSize=$gs text=${r.getString(0)}: $k vs $h")
      }
    }

  test("kernel equals the HOF bucket stream on real documents") {
    check(
      graft.model.Tables.documents(spark, "/root/testdata/sf0.001"),
      nb = 257, salt = "gb-t")
  }

  test("kernel equals the HOF stream on adversarial strings") {
    val df = Seq(
      "", " ", "  ", "a", "a b", " a", "a ", "  a  b ",
      "héllo wörld ñ", "日本語 トークン 分割",
      "x" * 500, ("tok " * 40).trim
    ).toDF("text")
    check(df, nb = 16, salt = "s")
    check(df, nb = 1, salt = "s") // every gram must land in bucket 0
  }

  test("NULL text yields NULL, matching split semantics") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val got = df.select(GramBuckets.gramBuckets(col("text"), 8, "s", 2)).collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
  }

  test("bigram stream order: unigrams in token order, then bigrams") {
    val got = Seq("u v w").toDF("text")
      .select(GramBuckets.gramBuckets(col("text"), 1 << 30, "o", 2))
      .collect()(0).getSeq[Long](0)
    assert(got.length == 5) // 3 unigrams + 2 bigrams
    def b(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"o:$g".getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % (1L << 30)
    }
    assert(got == Seq(b("u"), b("v"), b("w"), b("u v"), b("v w")))
  }
}
