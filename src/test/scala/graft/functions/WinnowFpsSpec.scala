package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck equivalence for the round-12 [[WinnowFps]] kernel: the
  * monotonic-deque selection must equal a PURE reference winnow (naive
  * per-window rightmost-argmin over reference gram hashes) on random
  * token streams — small alphabets force heavy hash ties (the
  * rightmost-tie rule's hard case), space runs produce empty tokens,
  * and k/w vary. DeflateSize determinism is property-checked too. */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    // reference: split-semantics tokens, poly hash of the joined gram,
    // naive window scan with rightmost tie
    val toks = text.split(" ", -1)
    val ngrams = toks.length - k + 1
    if (ngrams < w) return Set.empty
    val hashes = (0 until ngrams).map { i =>
      var acc = 0L
      toks.slice(i, i + k).mkString(" ").getBytes("UTF-8")
        .foreach(b => acc = (acc * 31L + (b & 0xff)) % 1000000007L)
      acc
    }
    (0 to ngrams - w).map { i0 =>
      var best = i0
      (i0 until i0 + w).foreach { j => if (hashes(j) <= hashes(best)) best = j }
      (best, hashes(best))
    }.toSet
  }

  private val tokenGen: Gen[String] =
    Gen.oneOf("a", "b", "ab", "xyz", "", "aa") // tiny alphabet -> many hash ties + empty tokens
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, tokenGen).map(_.mkString(" ")))

  test("scalacheck: WinnowFps kernel == pure reference winnow across k/w and tie-heavy inputs") {
    val gen = for {
      text <- textGen
      k <- Gen.chooseNum(1, 4)
      w <- Gen.chooseNum(1, 5)
    } yield (text, k, w)
    check(Prop.forAll(gen) { case (text, k, w) =>
      val got = graft.ops.Text
        .winnowFingerprints(Seq((1L, text)).toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
      got == refWinnow(text, k, w)
    })
  }

  test("scalacheck: DeflateSize deterministic and bounded by deflate overhead") {
    val gen = Gen.chooseNum(0, 500).flatMap(n =>
      Gen.listOfN(n, Gen.choose('!', '~')).map(_.mkString))
    check(Prop.forAll(gen) { s =>
      val df = Seq(s, s).toDF("text")
        .select(DeflateSize.deflateSize(col("text")).as("n"))
      val ns = df.collect().map(_.getInt(0))
      ns(0) == ns(1) && ns(0) >= 2 && ns(0) <= s.getBytes("UTF-8").length + 16
    })
  }
}
