package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CdcChunks]] — partition property, pure-Scala reference
  * equivalence on seeded random streams, and the property the kernel
  * exists for: shift-robustness (a head edit leaves all chunks past
  * the first content boundary identical, where fixed-size chunking
  * shifts every one). */
class CdcChunksSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def kernel(text: String, w: Int, m: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(CdcChunks.cdcChunks(col("t"), w, m))
      .head().getSeq[String](0)

  /** Pure reference: same contract, independent spelling. */
  private def ref(text: String, w: Int, m: Int): Seq[String] = {
    val toks = text.split(" ", -1)
    val cuts = (0 to toks.length - w).filter { i =>
      val gram = toks.slice(i, i + w).mkString(" ")
      val fp = gram.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      fp % m == 0 && i + w < toks.length
    }.map(_ + w)
    val bounds = (0 +: cuts) :+ toks.length
    bounds.sliding(2).map { case Seq(a, b) => toks.slice(a, b).mkString(" ") }.toSeq
  }

  test("chunks partition the document: rejoining with single spaces restores the text") {
    val texts = Seq(
      "a b c d e f g h i j k l m n o p",
      "x", "", "a  b", // empty token from the double space
      Seq.fill(200)("tok").mkString(" "))
    for (t <- texts; m <- Seq(2, 4, 16)) {
      val chs = kernel(t, 2, m)
      assert(chs.mkString(" ") == t, s"text='$t' m=$m chunks=$chs")
      assert(chs == ref(t, 2, m), s"text='$t' m=$m")
    }
  }

  test("seeded random token streams equal the pure reference (w in 1..3, m in 2..32)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 40) {
      val n = rnd.nextInt(60)
      val text = Seq.fill(n)("t" + rnd.nextInt(9)).mkString(" ")
      val w = 1 + trial % 3
      val m = Seq(2, 4, 16, 32)(trial % 4)
      assert(kernel(text, w, m) == ref(text, w, m), s"trial $trial w=$w m=$m text='$text'")
    }
  }

  test("shift-robustness: a head insertion leaves chunks after the first boundary identical") {
    val rnd = new scala.util.Random(99)
    val body = Seq.fill(300)("w" + rnd.nextInt(50)).mkString(" ")
    val edited = "INSERTED " + body
    val a = kernel(body, 2, 8)
    val b = kernel(edited, 2, 8)
    assert(a.length > 3, "fixture must actually chunk")
    // every chunk of the original except (possibly) the first survives
    // in the edited doc's chunk set
    val survived = a.tail.toSet.intersect(b.toSet)
    assert(survived == a.tail.toSet, s"lost: ${a.tail.toSet -- b.toSet}")
    // fixed-size chunking (the contrast): 16-token blocks all shift
    val fixA = body.split(" ").grouped(16).map(_.mkString(" ")).toSet
    val fixB = edited.split(" ").grouped(16).map(_.mkString(" ")).toSet
    assert(fixA.intersect(fixB).isEmpty, "fixed-size chunks were expected to all shift")
  }
}
